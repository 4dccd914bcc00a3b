"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fire_tpu.models.facenet import tiny_facenet
from fire_tpu.ops.gallery_match import cosine_topk_f32
from fire_tpu.parallel.mesh import make_mesh
from fire_tpu.parallel.sharded_gallery import shard_gallery, sharded_cosine_topk
from fire_tpu.train.losses import arcface_logits, triplet_loss
from fire_tpu.train.trainer import init_state, make_train_step


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_topk_matches_single_device(rng):
    mesh = make_mesh((8, 1))
    n, d, b, k = 1024, 64, 5, 4
    gal = rng.standard_normal((n, d)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.ones(n, bool)
    valid[37:141] = False

    ref_sims, ref_idx = cosine_topk_f32(jnp.asarray(q), jnp.asarray(gal), jnp.asarray(valid), k=k)

    gal_s = shard_gallery(mesh, jnp.asarray(gal))
    val_s = shard_gallery(mesh, jnp.asarray(valid))
    sims, idx = sharded_cosine_topk(mesh, jnp.asarray(q), gal_s, val_s, k=k)

    # same neighbours (bf16 local matmul vs f32 ref: compare sets + sims)
    for i in range(b):
        assert set(np.asarray(idx)[i].tolist()) == set(np.asarray(ref_idx)[i].tolist())
        np.testing.assert_allclose(np.asarray(sims)[i], np.asarray(ref_sims)[i], atol=2e-2)


def test_sharded_topk_scalar_count_form(rng):
    """`valid` as a replicated row count — the form ShardedGalleryView
    uses so enrollment never re-shards a mask array."""
    mesh = make_mesh((8, 1))
    n, d, b, k = 512, 32, 3, 2
    gal = rng.standard_normal((n, d)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    count = 301

    valid = np.arange(n) < count
    ref_sims, ref_idx = cosine_topk_f32(jnp.asarray(q), jnp.asarray(gal), jnp.asarray(valid), k=k)
    gal_s = shard_gallery(mesh, jnp.asarray(gal))
    sims, idx = sharded_cosine_topk(mesh, jnp.asarray(q), gal_s, jnp.int32(count), k=k)
    for i in range(b):
        assert set(np.asarray(idx)[i].tolist()) == set(np.asarray(ref_idx)[i].tolist())
        np.testing.assert_allclose(np.asarray(sims)[i], np.asarray(ref_sims)[i], atol=2e-2)


def test_sharded_view_incremental_refresh(rng):
    """ShardedGalleryView syncs enrollments by updating only the
    touched 128-row blocks (VERDICT r1 weak #7); results must match a
    forced full re-shard exactly."""
    from fire_tpu.gallery.index import DeviceGallery, ShardedGalleryView
    from fire_tpu.parallel.sharded_gallery import update_sharded_rows

    mesh = make_mesh((8, 1))
    d = 32
    gal = DeviceGallery(embedding_dim=d, capacity=1024)
    for i in range(5):
        gal.add(rng.standard_normal(d).astype(np.float32), f"id{i}", db_id=i + 1)
    view = ShardedGalleryView(gal, mesh)
    assert view._synced == 5

    # enroll more; incremental path must ship only the dirty block
    for i in range(5, 140):  # crosses a 128-row block boundary
        gal.add(rng.standard_normal(d).astype(np.float32), f"id{i}", db_id=i + 1)
    view.refresh()
    assert view._synced == 140

    q = rng.standard_normal((4, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids_inc, dists_inc = view.query_batch(q, k=3)

    fresh = ShardedGalleryView(gal, mesh)  # full re-shard baseline
    ids_full, dists_full = fresh.query_batch(q, k=3)
    np.testing.assert_array_equal(ids_inc, ids_full)
    np.testing.assert_allclose(dists_inc, dists_full, atol=1e-6)

    # update_sharded_rows writes the right rows and nothing else
    base = shard_gallery(mesh, jnp.zeros((256, 8)))
    block = np.full((128, 8), 7.0, np.float32)
    out = np.asarray(update_sharded_rows(base, block, 128))
    assert (out[:128] == 0).all() and (out[128:] == 7).all()


def test_arcface_logits_margin_applied(rng):
    b, d, c = 4, 16, 10
    emb = rng.standard_normal((b, d)).astype(np.float32)
    w = rng.standard_normal((d, c)).astype(np.float32)
    labels = np.array([0, 3, 3, 9])
    with_m = np.asarray(arcface_logits(jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels)))
    no_m = np.asarray(arcface_logits(jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), margin=0.0))
    for i, l in enumerate(labels):
        assert with_m[i, l] < no_m[i, l]  # margin reduces target logit
        others = [j for j in range(c) if j != l]
        np.testing.assert_allclose(with_m[i, others], no_m[i, others], atol=1e-4)


def test_triplet_loss_ordering(rng):
    a = rng.standard_normal((6, 16)).astype(np.float32)
    p = a + 0.01
    n = rng.standard_normal((6, 16)).astype(np.float32)
    good = float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)))
    bad = float(triplet_loss(jnp.asarray(a), jnp.asarray(n), jnp.asarray(p)))
    assert good < bad


def test_sharded_train_step_runs_and_learns(rng):
    mesh = make_mesh((4, 2), devices=jax.devices())
    model = tiny_facenet(embed_dim=32, dtype=jnp.float32)
    opt = optax.adam(1e-3)
    state = init_state(model, jax.random.PRNGKey(0), num_classes=8, optimizer=opt, image_hw=(96, 96))
    step = make_train_step(model, opt, mesh=mesh)

    images = jnp.asarray(rng.random((8, 96, 96, 3)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 8, jnp.int32)
    losses = []
    for _ in range(3):
        state, loss = step(state, images, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # memorizes the tiny batch
    assert int(state.step) == 3


def test_graft_entry_dryrun():
    """The driver's multi-chip validation path."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_forward_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 512)
    assert bool(jnp.isfinite(out).all())

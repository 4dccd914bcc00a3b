"""The one-command ONNX parity gate (VERDICT r4 #8).

Real reference weight files are Git-LFS stubs in this environment, so
the gate is exercised against synthetic wire-format files built by
fire_tpu.models.onnx_export — byte-for-byte valid ONNX that the day a
real file appears would flow through the identical code path:
``python -m fire_tpu.verify_onnx <file>``.
"""

import json

import numpy as np
import pytest

from fire_tpu import verify_onnx
from fire_tpu.models import onnx_export as oe
from fire_tpu.models import onnx_import as oi


def _write(tmp_path, name, blob):
    p = tmp_path / name
    p.write_bytes(blob)
    return str(p)


def test_encoder_gate_passes_on_export(tmp_path, capsys):
    from tests.test_onnx_import import _tiny_facenet_vars

    _, variables = _tiny_facenet_vars(seed=3)
    path = _write(tmp_path, "facenet.onnx",
                  oe.export_facenet(variables, embed_dim=32,
                                    depths=(1, 1, 1), stem_width=8))
    rc = verify_onnx.main([path, "--dim", "32", "--depths", "1", "1", "1",
                           "--stem_width", "8", "--n", "2"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["ok"] is True
    assert out["role"] == "encoder"
    assert out["max_cosine_distance"] <= 1e-3


def test_yunet_gate_passes_on_export(tmp_path, capsys):
    import jax
    import jax.numpy as jnp

    from fire_tpu.models.yunet import YuNet

    tiny = YuNet(width=8, dtype=jnp.float32)
    variables = tiny.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    variables = jax.tree.map(np.asarray, variables)
    path = _write(tmp_path, "yunet.onnx",
                  oe.export_yunet(variables, width=8, image_hw=(64, 64)))
    rc = verify_onnx.main([path, "--role", "yunet", "--width", "8",
                           "--n", "2"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["ok"] is True, out
    assert out["matched_pairs"] > 0
    assert out["min_box_iou"] >= 0.99


def test_blazeface_gate_passes_on_export(tmp_path, capsys):
    import jax
    import jax.numpy as jnp

    from fire_tpu.models.blazeface import BlazeFace

    model = BlazeFace(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 128, 128, 3)))
    variables = jax.tree.map(np.asarray, variables)
    path = _write(tmp_path, "blazeface.onnx", oe.export_blazeface(variables))
    rc = verify_onnx.main([path, "--n", "2"])  # role auto-detected
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["ok"] is True, out
    assert out["role"] == "blazeface"


def test_role_autodetect(tmp_path):
    from tests.test_onnx_import import _tiny_facenet_vars

    _, variables = _tiny_facenet_vars(seed=4)
    g = oi.read_onnx_bytes(
        oe.export_facenet(variables, embed_dim=32, depths=(1, 1, 1),
                          stem_width=8))
    assert verify_onnx.detect_role(g) == "encoder"


def test_lfs_stub_is_loud(tmp_path):
    stub = (b"version https://git-lfs.github.com/spec/v1\n"
            b"oid sha256:deadbeef\nsize 1234\n")
    p = _write(tmp_path, "stub.onnx", stub)
    with pytest.raises(Exception, match="(?i)lfs"):
        verify_onnx.main([p])

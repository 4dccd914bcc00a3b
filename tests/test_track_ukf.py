"""UKF numerics: JAX implementation vs float64 numpy oracle."""

import numpy as np
import jax.numpy as jnp

from fire_tpu.track.ukf import (
    MerweUKF,
    kf_predict,
    kf_update,
    tracker_f_matrix,
    tracker_h_matrix,
)
from tests.golden_sort import NumpyMerweUKF, f_matrix


def _random_spd(rng, n, scale=1.0):
    a = rng.standard_normal((n, n))
    return (a @ a.T + n * np.eye(n)) * scale


def test_merwe_ukf_matches_numpy_linear(rng):
    """Moderate alpha (f32-friendly): JAX UKF ≡ numpy UKF."""
    n = 6
    F = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    fx = lambda s: F @ s
    hx = lambda s: s[:3]
    gold = NumpyMerweUKF(n, 3, fx, hx, alpha=0.5, beta=2.0, kappa=0.0)
    gold.x = rng.standard_normal(n)
    gold.P = _random_spd(rng, n)
    gold.Q = _random_spd(rng, n, 0.1)
    gold.R = np.eye(3) * 2.0

    ours = MerweUKF(n=n, fx=lambda s: jnp.asarray(F) @ s, hx=lambda s: s[:3],
                    alpha=0.5, beta=2.0, kappa=0.0)
    x, p = jnp.asarray(gold.x, jnp.float32), jnp.asarray(gold.P, jnp.float32)
    q, r = jnp.asarray(gold.Q, jnp.float32), jnp.asarray(gold.R, jnp.float32)

    for step in range(5):
        gold.predict()
        x, p, sig = ours.predict(x, p, q)
        np.testing.assert_allclose(np.asarray(x), gold.x, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(p), gold.P, rtol=1e-2, atol=1e-2)
        z = gold.hx(gold.x) + rng.standard_normal(3) * 0.1
        gold.update(z)
        x, p = ours.update(x, p, sig, jnp.asarray(z, jnp.float32), r)
        np.testing.assert_allclose(np.asarray(x), gold.x, rtol=1e-3, atol=1e-3)


def test_merwe_ukf_nonlinear_runs(rng):
    """Nonlinear fx: sanity — filter tracks a deterministic trajectory."""
    fx = lambda s: jnp.stack([s[0] + jnp.sin(s[1]), 0.99 * s[1]])
    hx = lambda s: s[:1]
    ukf = MerweUKF(n=2, fx=fx, hx=hx, alpha=0.5)
    x = jnp.asarray([0.0, 1.0])
    p = jnp.eye(2)
    q = jnp.eye(2) * 0.01
    r = jnp.eye(1) * 0.1
    true = np.array([0.0, 1.0])
    for _ in range(10):
        true = np.array([true[0] + np.sin(true[1]), 0.99 * true[1]])
        x, p, sig = ukf.predict(x, p, q)
        x, p = ukf.update(x, p, sig, jnp.asarray(true[:1], jnp.float32), r)
    assert abs(float(x[0]) - true[0]) < 0.3
    assert np.isfinite(np.asarray(p)).all()


def test_linear_kf_equals_reference_alpha_ukf(rng):
    """The tracker's device KF == the reference's alpha=1e-3 UKF (f64)
    for the exactly-linear tracker model — the equivalence that lets the
    hot path avoid the catastrophic Wc₀≈-1e6 weights in f32."""
    F64 = f_matrix()
    gold = NumpyMerweUKF(10, 4, lambda s: F64 @ s, lambda s: s[:4])  # alpha=1e-3
    gold.Q = np.diag([5.0, 5.0, 3.0, 3.0, 70.0, 70.0, 3.0, 3.0, 3.0, 3.0])
    gold.R = np.eye(4) * 10.0
    gold.x = np.array([100.0, 50.0, np.log(900.0), 0.0, 1, -1, 0, 0, 0, 0.0])
    gold.P = np.eye(10)

    f, h = tracker_f_matrix(), tracker_h_matrix()
    q = jnp.asarray(gold.Q, jnp.float32)
    r = jnp.asarray(gold.R, jnp.float32)
    x, p = jnp.asarray(gold.x, jnp.float32), jnp.asarray(gold.P, jnp.float32)

    for step in range(8):
        gold.predict()
        x, p = kf_predict(x, p, f, q)
        np.testing.assert_allclose(np.asarray(x), gold.x, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(p), gold.P, rtol=1e-3, atol=1e-2)
        z = gold.x[:4] + rng.standard_normal(4)
        gold.update(z)
        x, p = kf_update(x, p, jnp.asarray(z, jnp.float32), h, r)
        np.testing.assert_allclose(np.asarray(x), gold.x, rtol=1e-4, atol=1e-3)

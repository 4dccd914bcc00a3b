"""Unscented Kalman filter (Merwe scaled sigma points) in JAX.

TPU-native replacement for the reference's per-track filterpy UKF
(sort_UKF.py:95-103): the same Merwe sigma-point construction
(alpha/beta/kappa), unscented transform, and predict/update cycle,
written as pure functions that ``vmap`` over the whole track table —
the per-track Python math was the reference's hot-path bottleneck
(SURVEY.md §2.3).

Numerical note: the reference runs filterpy in float64 with
``alpha=1e-3`` (sort_UKF.py:95), giving centre weights of magnitude
~1e6 — catastrophic in float32.  Its process/measurement models are
exactly linear (sort_UKF.py:155-192), for which the UKF is
mathematically identical to the linear Kalman filter, so the tracker's
device hot path uses the :func:`kf_predict`/:func:`kf_update`
specialization below (stable in f32 and equal to the reference filter
up to floating point).  The general sigma-point implementation is kept
for nonlinear models and is validated against a float64 numpy oracle
in tests/test_track_ukf.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

# Covariance algebra is precision-critical: force true-f32 matmuls
# (the platform default lowers f32 matmuls to bf16 passes on TPU).
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


@dataclasses.dataclass(frozen=True)
class MerweUKF:
    """Functional UKF with Merwe scaled sigma points.

    Matches filterpy's ``MerweScaledSigmaPoints`` + ``UnscentedKalmanFilter``
    algebra: upper-triangular Cholesky rows as sigma directions, the
    same Wm/Wc weights, and the predict-sigmas-reused-in-update flow.
    """

    n: int
    fx: Callable[[jnp.ndarray], jnp.ndarray]
    hx: Callable[[jnp.ndarray], jnp.ndarray]
    alpha: float = 1e-3
    beta: float = 2.0
    kappa: float = 0.0

    @property
    def lambda_(self) -> float:
        return self.alpha ** 2 * (self.n + self.kappa) - self.n

    def weights(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n, lam = self.n, self.lambda_
        c = 0.5 / (n + lam)
        wm = jnp.full((2 * n + 1,), c)
        wc = jnp.full((2 * n + 1,), c)
        wm = wm.at[0].set(lam / (n + lam))
        wc = wc.at[0].set(lam / (n + lam) + (1.0 - self.alpha ** 2 + self.beta))
        return wm, wc

    def sigma_points(self, x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """(2n+1, n) sigma points; rows of chol((n+λ)P) as in filterpy
        (scipy upper-Cholesky convention: P = UᵀU, rows of U)."""
        n, lam = self.n, self.lambda_
        u = jnp.linalg.cholesky((lam + n) * p, upper=True)
        pts = jnp.concatenate([x[None, :], x[None, :] + u, x[None, :] - u], axis=0)
        return pts

    def predict(self, x, p, q):
        """Returns (x', P', sigmas_f).  Like filterpy, the sigma points
        handed to update are REGENERATED from the predicted (x', P') so
        the measurement update sees the process noise Q."""
        wm, wc = self.weights()
        sig = self.sigma_points(x, p)
        sig_f = jax.vmap(self.fx)(sig)
        xp = _mm(wm, sig_f)
        d = sig_f - xp[None, :]
        pp = _mm(d.T, wc[:, None] * d) + q
        return xp, pp, self.sigma_points(xp, pp)

    def update(self, x, p, sigmas_f, z, r):
        wm, wc = self.weights()
        sig_h = jax.vmap(self.hx)(sigmas_f)
        zp = _mm(wm, sig_h)
        dz = sig_h - zp[None, :]
        s = _mm(dz.T, wc[:, None] * dz) + r
        dx = sigmas_f - x[None, :]
        pxz = _mm(dx.T, wc[:, None] * dz)
        k = jnp.linalg.solve(s.T, pxz.T).T  # K = Pxz S⁻¹
        xn = x + _mm(k, z - zp)
        pn = p - _mm(_mm(k, s), k.T)
        return xn, pn


# ------------------------- linear specialization (tracker hot path) ----------


def tracker_f_matrix(dt: float = 1.0) -> jnp.ndarray:
    """Constant-acceleration transition over the 10-dim state
    [cx, cy, log_s, log_r, vx, vy, v_log_s, ax, ay, a_log_s]
    (sort_UKF.py:167-179)."""
    f = jnp.eye(10)
    h = 0.5 * dt * dt
    f = f.at[0, 4].set(dt).at[0, 7].set(h)
    f = f.at[1, 5].set(dt).at[1, 8].set(h)
    f = f.at[2, 6].set(dt).at[2, 9].set(h)
    f = f.at[4, 7].set(dt)
    f = f.at[5, 8].set(dt)
    f = f.at[6, 9].set(dt)
    return f


def tracker_h_matrix() -> jnp.ndarray:
    """Measurement extracts [cx, cy, log_s, log_r] (sort_UKF.py:181-192)."""
    return jnp.eye(4, 10)


def kf_predict(x, p, f, q):
    """Linear KF predict — exact UKF equivalent for linear fx."""
    xp = _mm(f, x)
    pp = _mm(_mm(f, p), f.T) + q
    return xp, pp


def kf_update(x, p, z, h, r):
    """Linear KF update (Joseph-free form, matching UKF algebra)."""
    zp = _mm(h, x)
    s = _mm(_mm(h, p), h.T) + r
    pxz = _mm(p, h.T)
    k = jnp.linalg.solve(s.T, pxz.T).T
    xn = x + _mm(k, z - zp)
    pn = p - _mm(_mm(k, s), k.T)
    return xn, pn


def _inv4_spd(s: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 4×4 inverse by 2×2 block decomposition (Schur
    complement).  ``s`` is SPD (innovation covariance S = P₄ + R with
    R = r·I), so both the A block and its Schur complement are
    invertible.  Fully vectorized — no LU loop, batches cleanly under
    vmap inside the tracker ``lax.scan``."""

    def inv2(m):
        det = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        adj = jnp.stack([
            jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1),
            jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1),
        ], axis=-2)
        return adj / det[..., None, None]

    a, b = s[..., :2, :2], s[..., :2, 2:]
    c, d = s[..., 2:, :2], s[..., 2:, 2:]
    ai = inv2(a)
    sc = d - _mm(c, _mm(ai, b))          # Schur complement of A
    sci = inv2(sc)
    aib = _mm(ai, b)
    top_left = ai + _mm(aib, _mm(sci, _mm(c, ai)))
    top_right = -_mm(aib, sci)
    bot_left = -_mm(sci, _mm(c, ai))
    return jnp.concatenate([
        jnp.concatenate([top_left, top_right], axis=-1),
        jnp.concatenate([bot_left, sci], axis=-1),
    ], axis=-2)


def kf_update_tracker(x, p, z, r_diag: float):
    """KF update specialized for the tracker's H = [I₄ 0] selector
    measurement (sort_UKF.py:181-192): S = P[:4,:4] + r·I and
    P Hᵀ = P[:, :4], so the two H matmuls vanish, and the 4×4 solve is
    a closed-form SPD inverse instead of a batched LU — the tracker
    scan is serial per frame, so the shorter op chain is the win.
    Algebraically identical to ``kf_update(x, p, z, H, r·I)``."""
    s = p[:4, :4] + r_diag * jnp.eye(4, dtype=p.dtype)
    si = _inv4_spd(s)
    k = _mm(p[:, :4], si)                # (10, 4)
    xn = x + _mm(k, z - x[:4])
    pn = p - _mm(_mm(k, s), k.T)
    return xn, pn

"""Float64 numpy oracle for the reference tracker semantics.

Implements, from the SURVEY.md §2.1 spec of sort_UKF.py, a
filterpy-equivalent Merwe-sigma-point UKF and the reference
``Track``/``Sort`` bookkeeping, in float64 — used as the golden
reference for fire_tpu.track (the reference itself cannot run here:
filterpy is not installed)."""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

MIN_LOG_AREA = np.log(10.0)
MIN_LOG_ASPECT = np.log(0.5)


class NumpyMerweUKF:
    """filterpy-equivalent UKF (upper-Cholesky sigma rows)."""

    def __init__(self, n, dim_z, fx, hx, alpha=1e-3, beta=2.0, kappa=0.0):
        self.n, self.dim_z, self.fx, self.hx = n, dim_z, fx, hx
        self.lam = alpha**2 * (n + kappa) - n
        c = 0.5 / (n + self.lam)
        self.wm = np.full(2 * n + 1, c)
        self.wc = np.full(2 * n + 1, c)
        self.wm[0] = self.lam / (n + self.lam)
        self.wc[0] = self.lam / (n + self.lam) + (1 - alpha**2 + beta)
        self.x = np.zeros(n)
        self.P = np.eye(n)
        self.Q = np.eye(n)
        self.R = np.eye(dim_z)
        self.sigmas_f = np.zeros((2 * n + 1, n))

    def _sigma_points(self, x, p):
        import scipy.linalg

        u = scipy.linalg.cholesky((self.lam + self.n) * p)  # upper
        pts = np.vstack([x[None], x[None] + u, x[None] - u])
        return pts

    def predict(self):
        sig = self._sigma_points(self.x, self.P)
        sigmas_f = np.array([self.fx(s) for s in sig])
        self.x = self.wm @ sigmas_f
        d = sigmas_f - self.x[None]
        self.P = d.T @ (self.wc[:, None] * d) + self.Q
        # filterpy regenerates sigma points post-predict so the update
        # sees the +Q covariance
        self.sigmas_f = self._sigma_points(self.x, self.P)

    def update(self, z):
        sig_h = np.array([self.hx(s) for s in self.sigmas_f])
        zp = self.wm @ sig_h
        dz = sig_h - zp[None]
        s = dz.T @ (self.wc[:, None] * dz) + self.R
        dx = self.sigmas_f - self.x[None]
        pxz = dx.T @ (self.wc[:, None] * dz)
        k = pxz @ np.linalg.inv(s)
        self.x = self.x + k @ (z - zp)
        self.P = self.P - k @ s @ k.T


def f_matrix(dt=1.0):
    f = np.eye(10)
    h = 0.5 * dt * dt
    f[0, 4] = dt; f[0, 7] = h
    f[1, 5] = dt; f[1, 8] = h
    f[2, 6] = dt; f[2, 9] = h
    f[4, 7] = dt; f[5, 8] = dt; f[6, 9] = dt
    return f


class GoldenTrack:
    MAX_V, MAX_A = 30.0, 20.0

    def __init__(self, bbox, track_id, max_age=4, use_ukf=True):
        F = f_matrix()
        if use_ukf:
            self.kf = NumpyMerweUKF(10, 4, lambda s: F @ s, lambda s: s[:4])
        else:
            self.kf = _LinearKF(F)
        self.kf.Q = np.diag([5.0, 5.0, 3.0, 3.0, 70.0, 70.0, 3.0, 3.0, 3.0, 3.0])
        self.kf.R = np.eye(4) * 10.0
        x, y, w, h = bbox
        s = w * h
        r = w / h if h != 0 else 1.0
        self.kf.x = np.array([
            x + w / 2, y + h / 2,
            np.log(s) if s > 0 else MIN_LOG_AREA,
            np.log(r) if r > 0 else MIN_LOG_ASPECT,
            0, 0, 0, 0, 0, 0,
        ], float)
        self.id = track_id
        self.age = 0
        self.tsu = 0
        self.max_age = max_age
        self.hits = 0
        self.streak = 0

    def clamp(self):
        self.kf.x[4:7] = np.clip(self.kf.x[4:7], -self.MAX_V, self.MAX_V)
        self.kf.x[7:10] = np.clip(self.kf.x[7:10], -self.MAX_A, self.MAX_A)

    def predict(self):
        self.kf.predict()
        self.age += 1
        self.tsu += 1
        self.clamp()
        return self.get_state()

    def update(self, bbox):
        x, y, w, h = bbox
        s = w * h
        r = w / h if h != 0 else 1.0
        z = np.array([
            x + w / 2, y + h / 2,
            np.log(s) if s > 0 else MIN_LOG_AREA,
            np.log(r) if r > 0 else MIN_LOG_ASPECT,
        ])
        self.kf.update(z)
        self.tsu = 0
        self.hits += 1
        self.streak += 1
        self.clamp()

    def get_state(self):
        cx, cy, log_s, log_r = self.kf.x[:4]
        log_s = max(log_s, MIN_LOG_AREA)
        log_r = max(log_r, MIN_LOG_ASPECT)
        s, r = np.exp(log_s), np.exp(log_r)
        w = np.sqrt(s * r)
        h = s / w
        w = np.clip(w, 10.0, 720.0)
        h = np.clip(h, 10.0, 720.0)
        return [int(cx - w / 2), int(cy - h / 2), int(w), int(h)]


class _LinearKF:
    def __init__(self, F):
        self.F = F
        self.x = np.zeros(10)
        self.P = np.eye(10)
        self.Q = np.eye(10)
        self.R = np.eye(4)
        self.H = np.eye(4, 10)

    def predict(self):
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, z):
        s = self.H @ self.P @ self.H.T + self.R
        k = self.P @ self.H.T @ np.linalg.inv(s)
        self.x = self.x + k @ (z - self.H @ self.x)
        self.P = self.P - k @ s @ k.T


def _iou(a, b):
    x1, y1, w1, h1 = a
    x2, y2, w2, h2 = b
    if w1 <= 0 or h1 <= 0 or w2 <= 0 or h2 <= 0:
        return 0.0
    xx1, yy1 = max(x1, x2), max(y1, y2)
    xx2, yy2 = min(x1 + w1, x2 + w2), min(y1 + h1, y2 + h2)
    inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
    union = w1 * h1 + w2 * h2 - inter
    return inter / union if union > 0 else 0.0


class GoldenSort:
    def __init__(self, max_age=4, min_hits=4, iou_threshold=0.3, max_distance=200.0, use_ukf=True):
        self.max_age, self.min_hits = max_age, min_hits
        self.iou_threshold, self.max_distance = iou_threshold, max_distance
        self.tracks = []
        self.next_id = 0
        self.use_ukf = use_ukf

    def update(self, detections):
        for trk in self.tracks:
            trk.predict()
        boxes = [trk.get_state() for trk in self.tracks]
        matches, unmatched_dets, _ = self._associate(detections, boxes)
        for t_idx, d_idx in matches.items():
            self.tracks[t_idx].update(detections[d_idx]["bbox"])
        for d_idx in unmatched_dets:
            self.tracks.append(
                GoldenTrack(detections[d_idx]["bbox"], self.next_id, self.max_age, self.use_ukf)
            )
            self.next_id += 1
        self.tracks = [t for t in self.tracks if t.tsu <= self.max_age]
        return [
            {"id": t.id, "bbox": t.get_state(), "age": t.age}
            for t in self.tracks
            if t.hits >= self.min_hits
        ]

    def _associate(self, detections, trackers):
        nd, nt = len(detections), len(trackers)
        if nt == 0:
            return {}, list(range(nd)), []
        cost = np.zeros((nd, nt), np.float32)
        for d, det in enumerate(detections):
            for t, trk in enumerate(trackers):
                iou = _iou(det["bbox"], trk)
                dc = np.array([det["bbox"][0] + det["bbox"][2] / 2, det["bbox"][1] + det["bbox"][3] / 2])
                tc = np.array([trk[0] + trk[2] / 2, trk[1] + trk[3] / 2])
                cost[d, t] = (1.0 - iou) + np.linalg.norm(dc - tc) / self.max_distance
        rows, cols = linear_sum_assignment(cost)
        matches, um_d, um_t = {}, set(range(nd)), set(range(nt))
        for d, t in zip(rows, cols):
            if cost[d, t] > (1.0 - self.iou_threshold) + 1.0:
                continue
            matches[t] = d
            um_d.discard(d)
            um_t.discard(t)
        return matches, sorted(um_d), sorted(um_t)

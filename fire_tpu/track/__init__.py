"""SORT tracking with a 10-dim unscented Kalman filter, vmapped on device.

Replaces the reference's per-track Python filterpy UKF loop
(sort_UKF.py) with a fixed-capacity structure-of-arrays track table
whose predict/update/associate steps are batched XLA ops.
"""

from fire_tpu.track.sort import Sort, TrackTable, sort_step  # noqa: F401
from fire_tpu.track.ukf import MerweUKF, kf_predict, kf_update  # noqa: F401

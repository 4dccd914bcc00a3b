"""CPU affinity pinning (modules/utils.py:7-12 equivalent).

The reference offers ``--core 1`` to pin the process to core 0 for
benchmarking; kept for CLI parity (host-side only — device compute is
unaffected)."""

from __future__ import annotations

import logging

log = logging.getLogger(__name__)


def set_single_core_affinity(core: int = 0) -> None:
    try:
        import psutil

        psutil.Process().cpu_affinity([core])
        log.info("Pinned process to CPU core %d.", core)
    except Exception as e:  # pragma: no cover - platform dependent
        log.warning("Could not set CPU affinity: %s", e)

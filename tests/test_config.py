"""Config must be importable with no usable JAX backend (VERDICT r3 #1).

Round 3's bench crash traced to ``float(jnp.log(10.0))`` at
class-definition time in fire_tpu/config.py — importing ANY fire_tpu
module demanded a live TPU backend.  The constants are plain
``math.log`` now; this pins the property by importing the package in a
subprocess whose only JAX platform is a nonexistent one, where any
backend initialization raises.
"""

import subprocess
import sys


def test_import_without_backend():
    code = (
        "import fire_tpu.config as c\n"
        "import fire_tpu.pipeline.factories\n"
        "cfg = c.RecognizerConfig()\n"
        "t = c.TrackerConfig()\n"
        "print('OK', t.min_log_area)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            # importing must never initialize a backend; if it tries,
            # this platform name makes jax raise immediately
            "JAX_PLATFORMS": "no_such_platform",
        },
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.startswith("OK"), proc.stdout

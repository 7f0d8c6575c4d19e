"""``tpuil doctor`` — environment/device diagnostics.

Deployment reality for tunneled/remote accelerators: the device can be
WEDGED (transfers hang rather than error), the platform plugin can silently
drop off PYTHONPATH, or the native extension can be missing. Every
device-touching probe here therefore runs in a TIMEOUT-BOUNDED SUBPROCESS —
the doctor itself can never hang, and a wedge is reported as a failed check
with its symptom instead of a frozen terminal.

Checks:
  jax_import        — jax version + platform + device count (subprocess)
  device_compute    — tiny reduce + host fetch actually completes (subprocess)
  compile_smoke     — jit compile + execute a conv, wall timings (subprocess)
  virtual_cpu_mesh  — 8-virtual-device CPU mesh forms and psums (subprocess)
  native_framestore — the C++ framestore library loads (in-process, no device)
  configs           — the packaged config tree composes (in-process)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


def _probe(code: str, timeout: float, force_cpu: bool = False) -> dict:
    """Run a python snippet in a fresh subprocess; the snippet must print one
    JSON object on its last stdout line. Returns {ok, seconds, ...payload}
    or {ok: False, error/symptom}."""
    if force_cpu:
        code = ('import jax\n'
                'jax.config.update("jax_platforms", "cpu")\n') + code
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                              capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return {"ok": False, "seconds": round(time.time() - t0, 1),
                "symptom": f"probe hung past {timeout:.0f}s — device/tunnel "
                           "wedged (kill nothing; wedges self-recover)"}
    secs = round(time.time() - t0, 2)
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        return {"ok": False, "seconds": secs, "error": " | ".join(tail)}
    try:
        out = json.loads(proc.stdout.strip().splitlines()[-1])
    except (json.JSONDecodeError, IndexError):
        return {"ok": False, "seconds": secs,
                "error": f"unparseable probe output: {proc.stdout[-200:]!r}"}
    out.setdefault("ok", True)
    out["seconds"] = secs
    return out


_JAX_IMPORT = """
import json, jax
print(json.dumps({"version": jax.__version__,
                  "platform": jax.devices()[0].platform,
                  "device_count": jax.device_count()}))
"""

_DEVICE_COMPUTE = """
import json, time, jax, jax.numpy as jnp
t0 = time.time()
v = float(jnp.sum(jnp.arange(4096, dtype=jnp.float32)))  # fetch = completion
assert v == 4096 * 4095 / 2, v
print(json.dumps({"fetch_seconds": round(time.time() - t0, 3)}))
"""

_COMPILE_SMOKE = """
import json, time, jax, jax.numpy as jnp
x = jnp.ones((8, 32, 32, 4))
k = jnp.ones((3, 3, 4, 16)) * 0.01
f = jax.jit(lambda x: jax.lax.conv_general_dilated(
    x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
t0 = time.time(); f.lower(x).compile(); tc = time.time() - t0
t0 = time.time(); s = float(jnp.sum(f(x))); te = time.time() - t0
print(json.dumps({"compile_seconds": round(tc, 2),
                  "execute_seconds": round(te, 3)}))
"""

_CPU_MESH = """
import json, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec
mesh = Mesh(jax.devices()[:8], ("data",))
x = jax.device_put(jnp.arange(8.0), NamedSharding(mesh, PartitionSpec("data")))
total = float(jax.jit(lambda v: jnp.sum(v))(x))
assert total == 28.0, total
print(json.dumps({"devices": 8}))
"""


def run_doctor(timeout: float = 90.0, force_cpu: bool = False) -> dict:
    """Run every check; returns {ok, checks: {name: result}}. ``force_cpu``
    pins the device probes to the CPU backend (tests; or diagnosing the
    host while an accelerator tunnel is down)."""
    checks: dict = {}
    checks["jax_import"] = _probe(_JAX_IMPORT, timeout, force_cpu)
    checks["device_compute"] = _probe(_DEVICE_COMPUTE, timeout, force_cpu)
    checks["compile_smoke"] = _probe(_COMPILE_SMOKE, max(timeout, 120.0)
                                     if not force_cpu else timeout, force_cpu)
    checks["virtual_cpu_mesh"] = _probe(_CPU_MESH, timeout)

    t0 = time.time()
    try:
        from carla_imitation_learning_tpu.native.framestore import _load

        lib = _load()
        checks["native_framestore"] = {
            "ok": True, "seconds": round(time.time() - t0, 2),
            "backend": "cpp" if lib is not None else "numpy-fallback"}
    except Exception as e:  # noqa: BLE001 — diagnostic surface
        checks["native_framestore"] = {"ok": False, "error": str(e)}

    t0 = time.time()
    try:
        from carla_imitation_learning_tpu import compose

        cfg = compose("config", overrides=["model=imitation"])
        checks["configs"] = {"ok": bool(cfg.get("BATCH_SIZE")),
                             "seconds": round(time.time() - t0, 2)}
    except Exception as e:  # noqa: BLE001
        checks["configs"] = {"ok": False, "error": str(e)}

    return {"ok": all(c.get("ok") for c in checks.values()), "checks": checks}


def print_report(report: dict) -> None:
    from carla_imitation_learning_tpu.utils import ColorPrint

    for name, c in report["checks"].items():
        line = f"{name:<18} " + ", ".join(
            f"{k}={v}" for k, v in c.items() if k != "ok")
        (ColorPrint.print_run if c.get("ok")
         else ColorPrint.print_warn)(("ok   " if c.get("ok") else "FAIL ") + line)

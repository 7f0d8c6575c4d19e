"""Policy export: serialize a trained policy to a self-contained StableHLO
artifact (``jax.export``) that deploys WITHOUT the model source code.

The reference has no deployment story at all — a trained Lightning checkpoint
can only be used by re-importing the torch model class
(reference train.py:198-201 ``load_from_checkpoint``). The TPU-native
equivalent of "a servable" is an ahead-of-time-lowered StableHLO program:

- **params are baked in** as program constants — one file is the whole policy;
- **the batch dimension is symbolic** (``jax.export.symbolic_shape``) — one
  artifact serves any request size, no bucket re-export;
- **multi-platform lowering** (``platforms=("tpu", "cpu")``) — the same
  artifact runs on a TPU server and in a CPU integration test;
- the input contract is the *transport* format: the raw uint8 NHWC frame
  window exactly as the rollout framebuffer/framestore holds it
  (training/closed_loop.py ``_quantize``); the /255 normalization is fused
  into the program so clients never touch floats.

Artifact layout (a directory):
    policy.stablehlo   — serialized jax.export blob
    meta.json          — input spec, output spec, platforms, format version

``load_policy`` needs only jax — no flax, no model class, no param pytree.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

FORMAT_VERSION = 1
_BLOB = "policy.stablehlo"
_META = "meta.json"


def _spec_to_json(s: jax.ShapeDtypeStruct) -> dict:
    return {"shape": [str(d) for d in s.shape], "dtype": str(s.dtype)}


def export_fn(
    fn: Callable,
    example_specs: Sequence[jax.ShapeDtypeStruct],
    path: str | Path,
    *,
    platforms: Sequence[str] = ("tpu", "cpu"),
    meta: dict | None = None,
) -> Path:
    """Export ``fn(*args)`` (params already closed over) to ``path``.

    ``example_specs`` are ShapeDtypeStructs; dims given as strings (e.g.
    ``"b"``) become symbolic — the exported program accepts any size there.
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    scope = jax_export.SymbolicScope()
    specs = []
    for s in example_specs:
        dims = tuple(
            jax_export.symbolic_shape(d, scope=scope)[0]
            if isinstance(d, str) else d
            for d in s.shape
        )
        specs.append(jax.ShapeDtypeStruct(dims, s.dtype))
    exp = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(*specs)
    (path / _BLOB).write_bytes(exp.serialize())
    out_specs = [
        {"shape": [str(d) for d in t.shape], "dtype": str(t.dtype)}
        for t in exp.out_avals
    ]
    info = {
        "format_version": FORMAT_VERSION,
        "platforms": list(exp.platforms),
        "inputs": [_spec_to_json(s) for s in specs],
        "outputs": out_specs,
        "jax_version": jax.__version__,
    }
    info.update(meta or {})
    (path / _META).write_text(json.dumps(info, indent=1))
    return path


def export_policy(
    model: Any,
    params: Any,
    path: str | Path,
    *,
    height: int,
    width: int,
    obs_size: int = 4,
    platforms: Sequence[str] = ("tpu", "cpu"),
    quantize: str | None = None,
    extra_meta: dict | None = None,
) -> Path:
    """Export a flax policy (PolicyCNN-shaped: frames → logits) as a servable.

    Input contract: uint8 NHWC ``(b, height, width, obs_size)`` — the raw
    4-frame grayscale window as stored/rolled-out. Outputs float32 logits
    ``(b, n_actions)``; argmax/softmax is the engine's job (serving/engine.py)
    so the artifact stays a pure function.

    ``quantize="int8"`` exports the int8 inference program (serving/quant.py):
    per-channel int8 weights are constant-folded into the artifact, int8
    dynamic-activation contractions run on the MXU at 2× the bf16 rate.
    """
    params = jax.device_get(params)  # bake host copies, not device refs

    if quantize is None:
        def infer(frames_u8: jnp.ndarray) -> jnp.ndarray:
            obs = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
            return model.apply({"params": params}, obs)
    elif quantize == "int8":
        from carla_imitation_learning_tpu.serving.quant import (
            make_quantized_policy,
        )

        infer = make_quantized_policy(model, params)
    else:
        raise ValueError(f"unknown quantize mode {quantize!r}")

    spec = jax.ShapeDtypeStruct(("b", height, width, obs_size), jnp.uint8)
    meta = {"kind": "policy", "model": type(model).__name__,
            "height": height, "width": width, "obs_size": obs_size,
            "quantize": quantize or "none"}
    meta.update(extra_meta or {})
    return export_fn(infer, [spec], path, platforms=platforms, meta=meta)


def export_cil_policy(
    model: Any,
    params: Any,
    path: str | Path,
    *,
    height: int,
    width: int,
    obs_size: int = 4,
    platforms: Sequence[str] = ("tpu", "cpu"),
    quantize: str | None = None,
    extra_meta: dict | None = None,
) -> Path:
    """Export a command-conditioned (BranchedCILPolicy-shaped) policy as a
    MULTI-INPUT servable: ``(frames_u8 (b,H,W,C), speed f32 (b,),
    command i32 (b,)) → action logits (b, n_actions)``.

    The command clip (into this head's taxonomy — same convention as
    ``BranchedCILPolicy.as_policy_fn``) is baked INTO the program, so the
    artifact is safe against out-of-taxonomy commands wherever it deploys.
    The speed head is a training-time auxiliary and is not exported. All
    batch dims share one symbolic size; ``quantize="int8"`` runs the
    Conv/Dense contractions int8 exactly like the single-input path (the
    branch einsums stay float — they are <2% of the FLOPs)."""
    params = jax.device_get(params)
    n_commands = int(getattr(model, "n_commands", 0)) or 1

    if quantize == "int8":
        from carla_imitation_learning_tpu.serving.quant import (
            quantize_params, quantized_apply,
        )

        qparams = quantize_params(params)

        def infer(frames_u8, speed, command):
            obs = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
            cmd = jnp.clip(command, 0, n_commands - 1)
            logits, _ = quantized_apply(model, qparams, obs,
                                        speed.astype(jnp.float32), cmd)
            return logits
    elif quantize is None:
        def infer(frames_u8, speed, command):
            obs = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
            cmd = jnp.clip(command, 0, n_commands - 1)
            logits, _ = model.apply({"params": params}, obs,
                                    speed.astype(jnp.float32), cmd)
            return logits
    else:
        raise ValueError(f"unknown quantize mode {quantize!r}")

    specs = [
        jax.ShapeDtypeStruct(("b", height, width, obs_size), jnp.uint8),
        jax.ShapeDtypeStruct(("b",), jnp.float32),
        jax.ShapeDtypeStruct(("b",), jnp.int32),
    ]
    meta = {"kind": "policy", "model": type(model).__name__,
            "height": height, "width": width, "obs_size": obs_size,
            "family": "cil", "n_commands": n_commands,
            "quantize": quantize or "none"}
    meta.update(extra_meta or {})
    return export_fn(infer, specs, path, platforms=platforms, meta=meta)


class LoadedPolicy:
    """A deserialized servable: ``call(*arrays)`` runs the baked program.

    Requires only jax at load time (no flax/model source). The call is a
    compiled XLA computation on the default backend; wrap it in
    serving.engine.InferenceEngine for padding/batching/latency stats.
    """

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta

    @property
    def platforms(self) -> tuple:
        return tuple(self._exported.platforms)

    def call(self, *args):
        out = self._exported.call(*args)
        return out[0] if isinstance(out, (tuple, list)) and len(out) == 1 else out

    def __call__(self, *args):
        return self.call(*args)


def load_policy(path: str | Path) -> LoadedPolicy:
    path = Path(path)
    meta = json.loads((path / _META).read_text())
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"artifact format {meta.get('format_version')} != {FORMAT_VERSION}")
    exported = jax_export.deserialize((path / _BLOB).read_bytes())
    return LoadedPolicy(exported, meta)


def policy_fn_from_servable(servable: LoadedPolicy):
    """Adapt a loaded artifact to the closed-loop ``policy_fn`` contract so
    the EXACT program you ship is the one you score (deserialized exports
    compose under jit, so this runs inside the rollout scan).

    The rollout hands the policy float obs in [0,1] derived from the uint8
    framebuf (obs = framebuf/255); the artifact's input contract is the raw
    uint8 window, so the round-trip ``round(obs·255)`` reconstructs the
    framebuf exactly — no quantization drift between live and servable eval.

    Artifacts are self-describing: discrete-family artifacts (the default)
    emit logits and this adapter argmaxes them; artifacts exported with
    ``meta["family"] == "continuous"`` emit (steer, accel) controls, which
    pass through untouched (pair with ``control_space="continuous"``);
    ``meta["family"] == "cil"`` artifacts are multi-input — the adapter takes
    the rollout's extras (speed + navigation command) and the command clip is
    already baked inside the program (export_cil_policy).
    """
    import jax.numpy as jnp

    family = servable.meta.get("family")

    if family == "cil":
        def policy_fn(obs, extras):
            frames_u8 = jnp.clip(jnp.round(obs * 255.0), 0,
                                 255).astype(jnp.uint8)
            logits = servable.call(frames_u8,
                                   extras["speed"].astype(jnp.float32),
                                   extras["command"].astype(jnp.int32))
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return policy_fn

    continuous = family == "continuous"

    def policy_fn(obs):
        frames_u8 = jnp.clip(jnp.round(obs * 255.0), 0, 255).astype(jnp.uint8)
        out = servable.call(frames_u8)
        if continuous:
            return out.astype(jnp.float32)
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    return policy_fn

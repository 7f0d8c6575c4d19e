"""Import the reference's trained PyTorch (Lightning) checkpoints.

Migration killer-detail: a user of HemuManju/carla-imitation-learning has
trained ``.ckpt`` files (Lightning pickles of ``Imitation(net=ConvNet1)``,
reference train.py:106-111, imitation.py:31). This module converts those
weights into this framework's flax params — function-preserving, so the
imported policy produces the reference net's exact logits — and every
downstream surface (closed_loop_eval, export_policy, serving, DAgger
warm-starts) accepts the result.

Supported nets:
- ``ConvNet1`` → ``PolicyCNN``   (reference nets.py:6-39)
- ``ConvNetRawSegment`` → ``DualStreamCNN``   (nets.py:42-78; note the
  reference class itself cannot be INSTANTIATED due to its
  ``super(ConvNet1, self)`` copy-paste bug at nets.py:44 — the mapping is
  provided for state_dicts saved from a fixed variant)
- ``CNNAutoEncoder`` is NOT importable: the reference class cannot forward
  at all (``_get_flatten_size`` returns the last spatial dim, nets.py:116-119,
  so ``to_mu`` is built with in_features=4 but fed the 2048-wide flatten) —
  no real checkpoint of it can exist.

Layout notes (why this is exact): torch convs are OIHW → flax HWIO is a
pure transpose; torch Linear (out, in) → flax Dense kernel (in, out) is a
transpose; and the trunk's final feature map at the reference's 256² input
is 1×1 spatially (256→84→28→24→12→9→4→2→1), so the NCHW-vs-NHWC flatten
order coincides and the first Dense needs no permutation.

torch is an OPTIONAL dependency of this module only (reading the pickle);
nothing else in the framework imports it.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# reference module layout: Sequential indices of the parameterized layers
_CONV_IDX = (0, 3, 6, 9)   # cnn_base.{i}: Conv2d between ReLU/MaxPool
_FC_IDX = (0, 2, 4)        # fc.{i}: Linear between ReLUs


def _to_numpy_state_dict(path_or_sd) -> dict:
    if isinstance(path_or_sd, (str, Path)):
        import torch  # optional: only the importer needs it

        blob = torch.load(str(path_or_sd), map_location="cpu",
                          weights_only=False)
        sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
        return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                              else v) for k, v in sd.items()}
    return {k: np.asarray(v) for k, v in path_or_sd.items()}


def _strip_prefix(sd: dict) -> dict:
    """Lightning saves the wrapped net under its attribute name
    (``net.cnn_base.0.weight``, imitation.py:31); bare nn.Module state_dicts
    have no prefix. Strip any single leading component shared by ALL keys
    that isn't the architecture's own ('cnn_base'/'fc')."""
    while True:
        heads = {k.split(".", 1)[0] for k in sd}
        if heads <= {"cnn_base", "fc"}:
            return sd
        if len(heads) != 1 or any("." not in k for k in sd):
            raise ValueError(
                f"unrecognized checkpoint layout; top-level keys {sorted(heads)}"
                " (expected cnn_base.*/fc.* under at most one wrapper prefix)")
        sd = {k.split(".", 1)[1]: v for k, v in sd.items()}


def _conv(sd: dict, i: int) -> dict:
    w = sd[f"cnn_base.{i}.weight"]          # (O, I, kh, kw)
    return {"kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "bias": sd[f"cnn_base.{i}.bias"].astype(np.float32)}


def _dense(sd: dict, i: int) -> dict:
    w = sd[f"fc.{i}.weight"]                # (out, in)
    return {"kernel": np.transpose(w).astype(np.float32),
            "bias": sd[f"fc.{i}.bias"].astype(np.float32)}


def import_reference_policy(path_or_sd) -> dict:
    """Reference ConvNet1/ConvNetRawSegment weights → PolicyCNN/DualStreamCNN
    flax params ({ConvTrunk_0, MLPHead_0} pytree). The two reference nets
    share the module layout (4 convs + 3 linears), so one mapping covers
    both — the channel widths in the checkpoint decide which model the
    result fits."""
    sd = _strip_prefix(_to_numpy_state_dict(path_or_sd))
    missing = [k for i in _CONV_IDX for k in
               (f"cnn_base.{i}.weight", f"cnn_base.{i}.bias")
               if k not in sd] + \
              [k for i in _FC_IDX for k in
               (f"fc.{i}.weight", f"fc.{i}.bias") if k not in sd]
    if missing:
        raise ValueError(f"checkpoint lacks reference-policy keys: {missing}")
    return {
        "ConvTrunk_0": {f"Conv_{j}": _conv(sd, i)
                        for j, i in enumerate(_CONV_IDX)},
        "MLPHead_0": {f"Dense_{j}": _dense(sd, i)
                      for j, i in enumerate(_FC_IDX)},
    }


def import_and_save(ckpt_path, out_dir) -> str:
    """CLI helper: convert + write an Orbax checkpoint every consumer of
    ``checkpoint=`` accepts (closed_loop_eval, export_policy, rl_finetune,
    test_eval)."""
    from carla_imitation_learning_tpu.utils.checkpoint import save_pytree

    params = import_reference_policy(ckpt_path)
    save_pytree(out_dir, {"params": params})
    return str(out_dir)

"""CLI: ``tpuil run <experiment> [--override k=v ...]``.

Replaces the reference's edit-the-source workflow (flipping skip_run flags in
train.py:19-239) with named experiments + config overrides.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="tpuil",
        description="TPU-native driving-simulation + imitation-learning framework")
    sub = parser.add_subparsers(dest="command", required=True)

    run_p = sub.add_parser("run", help="run a named experiment")
    run_p.add_argument("experiment", nargs="?", default=None,
                       help="experiment name (see 'tpuil list'); may instead "
                            "come from a preset: -o experiment=<preset>")
    run_p.add_argument("--config", default="config", help="root config name")
    run_p.add_argument("--override", "-o", action="append", default=[],
                       metavar="K=V", help="config override (group or dotted value)")
    run_p.add_argument("--checkpoint", default=None, help="checkpoint to restore")
    run_p.add_argument("--json", action="store_true", help="print result as JSON")

    sub.add_parser("list", help="list experiments")

    imp_p = sub.add_parser(
        "import_torch",
        help="convert a reference PyTorch/Lightning policy checkpoint "
             "(ConvNet1/ConvNetRawSegment .ckpt) into a framework checkpoint")
    imp_p.add_argument("ckpt", help="path to the torch .ckpt/.pt file")
    imp_p.add_argument("--out", required=True,
                       help="output checkpoint dir (feeds checkpoint=...)")

    doc_p = sub.add_parser(
        "doctor", help="environment/device diagnostics (wedge-safe: every "
                       "device probe runs in a timeout-bounded subprocess)")
    doc_p.add_argument("--timeout", type=float, default=90.0,
                       help="per-probe timeout seconds")
    doc_p.add_argument("--cpu", action="store_true",
                       help="pin probes to the CPU backend (diagnose the "
                            "host while an accelerator tunnel is down)")
    doc_p.add_argument("--json", action="store_true")

    bench_p = sub.add_parser("bench", help="run the headline benchmark")
    bench_p.add_argument("--envs", type=int, default=1024)

    serve_p = sub.add_parser(
        "serve", help="serve an exported policy artifact over HTTP")
    serve_p.add_argument("artifact", help="artifact dir (see export_policy)")
    serve_p.add_argument("--host", default="127.0.0.1")
    serve_p.add_argument("--port", type=int, default=8471)
    serve_p.add_argument("--max-batch", type=int, default=64)
    serve_p.add_argument("--window-ms", type=float, default=2.0,
                         help="micro-batch coalescing window")
    serve_p.add_argument("--verbose", action="store_true",
                         help="log every request")

    args = parser.parse_args(argv)

    if args.command == "list":
        from carla_imitation_learning_tpu.experiments import EXPERIMENTS

        for name, fn in sorted(EXPERIMENTS.items()):
            doc = (fn.__doc__ or "").strip().splitlines()[0]
            print(f"{name:<20} {doc}")
        return 0

    if args.command == "import_torch":
        from carla_imitation_learning_tpu.utils import ColorPrint
        from carla_imitation_learning_tpu.utils.torch_import import (
            import_and_save,
        )

        out = import_and_save(args.ckpt, args.out)
        ColorPrint.print_run(
            f"imported {args.ckpt} -> {out} (use with -o checkpoint={out})")
        return 0

    if args.command == "doctor":
        from carla_imitation_learning_tpu.utils.doctor import (
            print_report, run_doctor,
        )

        report = run_doctor(timeout=args.timeout, force_cpu=args.cpu)
        if args.json:
            print(json.dumps(report))
        else:
            print_report(report)
        return 0 if report["ok"] else 1

    if args.command == "serve":
        from carla_imitation_learning_tpu.serving import PolicyServer
        from carla_imitation_learning_tpu.utils import ColorPrint

        server = PolicyServer(args.artifact, host=args.host, port=args.port,
                              max_batch=args.max_batch,
                              window_ms=args.window_ms,
                              quiet=not args.verbose)
        server.start()
        try:
            server.warmup()  # pre-compile every bucket before first request
        except RuntimeError:
            pass  # artifact without static input shape: compile on demand
        ColorPrint.print_run(
            f"serving {args.artifact} at {server.url} "
            f"(buckets {list(server.engine.buckets)})")
        server.serve_forever()
        return 0

    if args.command == "bench":
        import importlib.util
        from pathlib import Path

        # repo-root bench.py, resolved relative to the package (cwd-agnostic)
        path = Path(__file__).resolve().parents[1] / "bench.py"
        spec = importlib.util.spec_from_file_location("tpuil_bench", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        return 0

    from carla_imitation_learning_tpu import compose
    from carla_imitation_learning_tpu.experiments import EXPERIMENTS
    from carla_imitation_learning_tpu.utils import ColorPrint
    from carla_imitation_learning_tpu.utils.jax_setup import setup_jax

    setup_jax()

    # resolve the experiment: positional arg, or an experiment preset
    # (-o experiment=<name> merges configs/experiment/<name>.yaml, whose
    # experiment_name selects the block — reference's exp_example_* scheme)
    name = args.experiment
    if name is None:
        pre = compose(args.config, overrides=list(args.override))
        name = pre.get("experiment_name")
        if not name:
            ColorPrint.print_warn(
                "no experiment given: pass a name or -o experiment=<preset>")
            return 2
    if name not in EXPERIMENTS:
        ColorPrint.print_warn(
            f"unknown experiment {name!r}; available: "
            f"{', '.join(sorted(EXPERIMENTS))}")
        return 2

    # experiment-appropriate default model group (reference composes
    # model=imitation for the BC blocks, train.py:95)
    overrides = list(args.override)
    if name.startswith(("bc", "test", "hpo", "dagger", "closed", "collect")) \
            and not any(o.startswith("model=") for o in overrides):
        overrides.insert(0, "model=imitation")
    cfg = compose(args.config, overrides=overrides)

    ColorPrint.print_run(f"running experiment {name}")
    kw = {}
    if args.checkpoint:
        kw["checkpoint"] = args.checkpoint
    result = EXPERIMENTS[name](cfg, **kw)

    def scrub(x):
        if isinstance(x, dict):
            return {k: scrub(v) for k, v in x.items() if k != "state"}
        if isinstance(x, (list, tuple)):
            return [scrub(v) for v in x]
        if hasattr(x, "item") and getattr(x, "ndim", 1) == 0:
            return x.item()
        return x

    printable = scrub(result)
    if args.json:
        print(json.dumps(printable, default=str))
    else:
        print(json.dumps(printable, indent=1, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())

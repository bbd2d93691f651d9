"""CLI dispatcher: ``beer <group> <subcommand>`` (reference ``beer/cli``)."""

from __future__ import annotations

import argparse
import importlib
import sys

GROUPS = {
    "dataset": ["create"],
    "features": ["extract"],
    "hmm": ["mkphones", "mkphoneloop", "align", "train", "decode",
            "accumulate", "update"],
    "shmm": ["train"],
}

# Subcommands whose work is accelerator-worthy.  Everything else (model
# construction, manifests, small per-utterance prep) is a handful of
# eager ops — on a remote-compiled TPU backend (axon tunnel) every eager
# op is a compile round trip, turning a millisecond job into minutes —
# so those default to CPU.  Decode/align also default to CPU: they
# recompile per utterance length, which the tunnel makes minutes-per-
# shape (pass --device tpu for large bucketed corpora).  Override with
# --device.
# Subcommands that default to the accelerator under --device auto.
# `hmm accumulate` is deliberately NOT here: recipes fan out N concurrent
# accumulate processes (recipes/lib/parallel_vbem.sh) and the exclusive
# TPU backend admits one; a single-job accumulate can pass --device tpu.
_TPU_WORTHY = {("hmm", "train"), ("shmm", "train")}


def _tpu_reachable(timeout: float = 90.0) -> bool:
    """Probe accelerator init in a SUBPROCESS with a hard timeout.

    A dead remote-TPU tunnel makes ``jax.devices()`` block forever
    inside backend init (no socket timeout) — probing in-process would
    hang the CLI exactly like the bug this guards against.  Results are
    cached on disk (negative 5 min, positive 30 min) so recipes that
    invoke the CLI many times don't pay the probe per stage.  Skippable
    with BEER_NO_TPU_PROBE=1 (e.g. real local accelerators)."""
    import json
    import os
    import subprocess
    import tempfile
    import time

    if os.environ.get("BEER_NO_TPU_PROBE") == "1":
        return True
    cache = os.path.join(tempfile.gettempdir(), "beer_tpu_probe.json")
    now = time.time()
    try:
        with open(cache) as fh:
            st = json.load(fh)
        ttl = 1800 if st["ok"] else 300
        if now - st["ts"] < ttl:
            return st["ok"]
    except Exception:
        pass
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True,
        )
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    try:
        with open(cache, "w") as fh:
            json.dump({"ok": ok, "ts": now}, fh)
    except Exception:
        pass
    return ok


def _platform_pinned_cpu() -> bool:
    """True when the embedding process (tests, library callers) already
    pinned ``jax_platforms=cpu`` — accelerator routing is then moot."""
    if "jax" not in sys.modules:
        return False
    import jax

    return jax.config.jax_platforms == "cpu"


def _apply_device(args) -> None:
    device = getattr(args, "device", "auto")
    auto = device == "auto"
    if auto:
        device = "tpu" if (args.group, args.command) in _TPU_WORTHY else "cpu"
    if device == "tpu" and _platform_pinned_cpu():
        device = "cpu"
    if device == "tpu" and not _tpu_reachable():
        if not auto:
            raise SystemExit(
                "--device tpu: accelerator backend did not initialize "
                "within 90 s (tunnel down?)"
            )
        print(
            "warning: accelerator backend unreachable (tunnel down?) — "
            "falling back to CPU", file=sys.stderr,
        )
        device = "cpu"
    if device == "cpu":
        import jax

        # must be a config update, not JAX_PLATFORMS: the axon
        # sitecustomize force-registers the TPU backend via env
        jax.config.update("jax_platforms", "cpu")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="beer",
        description="TPU-native Bayesian speech modeling (beer_tpu)",
    )
    groups = parser.add_subparsers(dest="group", required=True)
    for group, cmds in GROUPS.items():
        gparser = groups.add_parser(group)
        subs = gparser.add_subparsers(dest="command", required=True)
        for cmd in cmds:
            mod = importlib.import_module(f"beer_tpu.cli.subcommands.{group}_{cmd}")
            sparser = subs.add_parser(cmd, help=mod.__doc__)
            sparser.add_argument(
                "--device", choices=["auto", "cpu", "tpu"], default="auto",
                help="compute device (auto: CPU for prep commands, "
                     "accelerator for training/decoding)",
            )
            mod.setup(sparser)
            sparser.set_defaults(_main=mod.main)
    args = parser.parse_args(argv)
    _apply_device(args)
    return args._main(args) or 0


if __name__ == "__main__":
    sys.exit(main())

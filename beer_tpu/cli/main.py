"""CLI dispatcher: ``beer <group> <subcommand>`` (reference ``beer/cli``)."""

from __future__ import annotations

import argparse
import importlib
import sys

GROUPS = {
    "dataset": ["create"],
    "features": ["extract"],
    "hmm": ["mkphones", "mkphoneloop", "align", "train", "decode"],
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
_TPU_WORTHY = {("hmm", "train"), ("shmm", "train")}


def _apply_device(args) -> None:
    device = getattr(args, "device", "auto")
    if device == "auto":
        device = "tpu" if (args.group, args.command) in _TPU_WORTHY else "cpu"
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

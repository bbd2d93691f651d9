"""Command-line interface.

Reference parity: ``beer/cli`` — the ``beer <group> <subcommand>``
console tool (groups: dataset, features, hmm, shmm; each subcommand a
module with ``setup(parser)`` / ``main(args)``).  Run as
``python -m beer_tpu.cli <group> <subcommand> ...``.
"""

from beer_tpu.cli.main import main

__all__ = ["main"]

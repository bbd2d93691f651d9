"""Create a dataset manifest from an scp-style list (reference: ``beer dataset``)."""

from __future__ import annotations

import json
from pathlib import Path


def setup(parser):
    parser.add_argument("scp", help="text file: '<uttid> <path>' per line")
    parser.add_argument("out", help="output manifest (.json)")


def main(args):
    utts = {}
    for line in Path(args.scp).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        uttid, path = line.split(maxsplit=1)
        utts[uttid] = path
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump({"utterances": utts}, fh, indent=1)
    print(f"wrote manifest with {len(utts)} utterances to {args.out}")

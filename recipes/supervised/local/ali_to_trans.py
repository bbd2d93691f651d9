"""Collapse per-frame alignments into phone transcriptions."""

import sys
from pathlib import Path


def main():
    ali, out = sys.argv[1], sys.argv[2]
    lines = []
    for line in Path(ali).read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        uttid, labels = parts[0], parts[1:]
        collapsed = [labels[0]] + [
            p for i, p in enumerate(labels[1:], 1) if p != labels[i - 1]
        ]
        lines.append(f"{uttid} {' '.join(collapsed)}")
    Path(out).write_text("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} transcriptions to {out}")


if __name__ == "__main__":
    main()

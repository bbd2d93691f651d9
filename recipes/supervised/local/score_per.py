"""Phone error rate (edit distance) between reference and hypothesis."""

import sys
from pathlib import Path

import numpy as np


def read_trans(path):
    out = {}
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if parts:
            out[parts[0]] = parts[1:]
    return out


def edit_distance(a, b):
    dp = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, len(b) + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                        prev[j - 1] + (a[i - 1] != b[j - 1]))
    return dp[-1]


def main():
    ref = read_trans(sys.argv[1])
    hyp = read_trans(sys.argv[2])
    errs = total = 0
    for utt, r in ref.items():
        if utt in hyp:
            errs += edit_distance(hyp[utt], r)
            total += len(r)
    print(f"PER: {100.0 * errs / max(total, 1):.2f}%  ({errs}/{total})")


if __name__ == "__main__":
    main()

"""AUD scoring: NMI of per-frame labels + phone-boundary F-score.

Reference parity: the scoring step of ``recipes/aud*`` (NMI / boundary
F-score against reference phone alignments — the metrics reported in the
SHMM/H-SHMM papers).
"""

import argparse
from collections import Counter

import numpy as np


def read_ali(path):
    out = {}
    for line in open(path):
        parts = line.split()
        if parts:
            out[parts[0]] = parts[1:]
    return out


def nmi(a, b):
    n = len(a)
    pa, pb, pab = Counter(a), Counter(b), Counter(zip(a, b))
    mi = sum(
        (c / n) * np.log((c / n) / ((pa[x] / n) * (pb[y] / n)))
        for (x, y), c in pab.items()
    )
    ha = -sum((c / n) * np.log(c / n) for c in pa.values())
    hb = -sum((c / n) * np.log(c / n) for c in pb.values())
    return mi / max(np.sqrt(ha * hb), 1e-10)


def boundaries(labels):
    return {i for i in range(1, len(labels)) if labels[i] != labels[i - 1]}


def boundary_prf(ref, hyp, tol=2):
    """Precision/recall/F of hypothesized boundaries within ±tol frames."""
    tp = 0
    matched = set()
    for b in hyp:
        hit = next(
            (r for r in ref if abs(r - b) <= tol and r not in matched), None
        )
        if hit is not None:
            matched.add(hit)
            tp += 1
    prec = tp / max(len(hyp), 1)
    rec = tp / max(len(ref), 1)
    f = 2 * prec * rec / max(prec + rec, 1e-10)
    return prec, rec, f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref")
    ap.add_argument("hyp")
    args = ap.parse_args()
    ref, hyp = read_ali(args.ref), read_ali(args.hyp)
    all_ref, all_hyp = [], []
    prf = []
    for utt, r in ref.items():
        if utt not in hyp:
            continue
        h = hyp[utt]
        ln = min(len(r), len(h))
        all_ref += r[:ln]
        all_hyp += h[:ln]
        prf.append(boundary_prf(boundaries(r[:ln]), boundaries(h[:ln])))
    prf = np.array(prf)
    print(f"frames scored: {len(all_ref)}  utterances: {len(prf)}")
    print(f"NMI: {100 * nmi(all_ref, all_hyp):.2f}")
    print(
        "boundary precision/recall/F: "
        f"{100 * prf[:, 0].mean():.1f} / {100 * prf[:, 1].mean():.1f} / "
        f"{100 * prf[:, 2].mean():.1f}"
    )


if __name__ == "__main__":
    main()

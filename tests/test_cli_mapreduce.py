"""File-based map-reduce VB-EM: accumulate shards + update == vb_step.

Reference parity: ``utils/parallel/`` in the reference recipes — the
Kaldi-style job-array map-reduce over utterance shards (SURVEY.md §2.10).
``beer hmm accumulate --shard i/N`` + ``beer hmm update`` must reproduce
one full-batch conjugate update exactly (same statistics, same ELBO),
because the per-shard statistics are sums over disjoint utterances.
"""

import numpy as np
import pytest

from beer_tpu.cli.main import main as cli


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("mapreduce")
    feats = {
        f"utt{i}": rng.normal(size=(int(rng.integers(20, 60)), 6)).astype(
            np.float32
        )
        for i in range(5)
    }
    np.savez(root / "feats.npz", **feats)
    (root / "hmm.yml").write_text(
        "n_units: 3\nstates_per_unit: 2\ncov_type: diagonal\n"
        "concentration: 2.0\n"
    )
    assert cli([
        "hmm", "mkphoneloop", str(root / "hmm.yml"),
        str(root / "feats.npz"), str(root / "init.mdl"),
    ]) == 0
    return root


def test_accumulate_update_matches_vb_step(workdir):
    import jax
    import jax.numpy as jnp

    from beer_tpu.cli.subcommands.hmm_train import pad_archive
    from beer_tpu.utils import load_model
    from beer_tpu.vbi import vb_step

    root = workdir
    for shard in ("1/2", "2/2"):
        assert cli([
            "hmm", "accumulate", str(root / "init.mdl"),
            str(root / "feats.npz"),
            str(root / f"shard{shard[0]}.acc"), "--shard", shard,
        ]) == 0
    assert cli([
        "hmm", "update", str(root / "init.mdl"), str(root / "mr.mdl"),
        str(root / "shard1.acc"), str(root / "shard2.acc"),
    ]) == 0

    model = load_model(root / "init.mdl")
    _, data, mask = pad_archive(str(root / "feats.npz"))
    _, full = vb_step(model, jnp.asarray(data), mask=jnp.asarray(mask))
    reduced = load_model(root / "mr.mdl")
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(reduced)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_shard_elbos_reduce_to_full_elbo(workdir, capsys):
    """Sum of shard ELBOs (KL kept once) == full-batch ELBO."""
    import jax.numpy as jnp

    from beer_tpu.cli.subcommands.hmm_train import pad_archive
    from beer_tpu.utils import load_model
    from beer_tpu.vbi import elbo_and_stats

    root = workdir
    payload1 = load_model(root / "shard1.acc")
    payload2 = load_model(root / "shard2.acc")
    model = load_model(root / "init.mdl")
    kl = float(model.kl_div_posterior_prior())
    reduced_elbo = float(payload1["elbo"]) + float(payload2["elbo"]) + kl

    _, data, mask = pad_archive(str(root / "feats.npz"))
    full_elbo, _ = elbo_and_stats(model, jnp.asarray(data),
                                  mask=jnp.asarray(mask))
    frames = float(mask.sum())
    assert abs(reduced_elbo - float(full_elbo)) / frames < 1e-4
    assert float(payload1["frames"]) + float(payload2["frames"]) == frames


def test_update_rejects_duplicate_shards(workdir):
    root = workdir
    with pytest.raises(SystemExit):
        cli([
            "hmm", "update", str(root / "init.mdl"), str(root / "dup.mdl"),
            str(root / "shard1.acc"), str(root / "shard1.acc"),
        ])


def test_update_rejects_incomplete_shard_set(workdir, tmp_path):
    """A non-complete i/N set hard-errors (stale .acc protection) unless
    --allow-partial is given."""
    root = workdir
    with pytest.raises(SystemExit, match="not a complete"):
        cli([
            "hmm", "update", str(root / "init.mdl"),
            str(tmp_path / "part.mdl"), str(root / "shard1.acc"),
        ])
    assert cli([
        "hmm", "update", str(root / "init.mdl"),
        str(tmp_path / "part.mdl"), str(root / "shard1.acc"),
        "--allow-partial",
    ]) == 0
    assert (tmp_path / "part.mdl").exists()


def test_single_batch_shard_does_not_pad_to_batch_size(workdir, tmp_path, capsys):
    """A 5-utterance shard with the default --batch-size 512 computes a
    5-utterance batch, not a zero-padded 512-utterance one (and still
    produces the exact statistics)."""
    import jax
    import jax.numpy as jnp

    from beer_tpu.cli.subcommands.hmm_train import pad_archive
    from beer_tpu.utils import load_model
    from beer_tpu.vbi import elbo_and_stats

    root = workdir
    out = tmp_path / "whole.acc"
    assert cli([
        "hmm", "accumulate", str(root / "init.mdl"),
        str(root / "feats.npz"), str(out),
    ]) == 0
    payload = load_model(out)
    model = load_model(root / "init.mdl")
    _, data, mask = pad_archive(str(root / "feats.npz"))
    _, acc = elbo_and_stats(model, jnp.asarray(data), mask=jnp.asarray(mask))
    for a, b in zip(jax.tree.leaves(payload["acc"]), jax.tree.leaves(acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_archive_write_is_atomic(tmp_path):
    """write_archive publishes via rename: no partial file is ever visible
    at the target path, and concurrent converters are safe."""
    import os

    from beer_tpu import io as bio

    rng = np.random.default_rng(0)
    utts = {f"u{i}": rng.normal(size=(10, 4)).astype(np.float32)
            for i in range(3)}
    target = tmp_path / "feats.bar"
    bio.write_archive(target, utts)
    arch = bio.Archive(str(target))
    assert len(arch) == 3
    arch.close()
    leftovers = [p for p in os.listdir(tmp_path) if ".tmp." in p]
    assert leftovers == []


_FAKE_QSUB = """#!/usr/bin/env bash
# Minimal SGE shim: understands the flags parallel_vbem.sh emits
# (-sync y -t LO-HI -cwd -j y -o pattern [SGE_OPTS...] script) and runs
# every array task sequentially in this process, propagating failures —
# the -sync y contract.
set -euo pipefail
range="" script=""
while [ $# -gt 0 ]; do
  case $1 in
    -t) range=$2; shift 2 ;;
    -sync|-o|-j|-q|-l) shift 2 ;;
    -cwd) shift ;;
    *) script=$1; shift ;;
  esac
done
lo=${range%-*}; hi=${range#*-}
for i in $(seq "$lo" "$hi"); do
  SGE_TASK_ID=$i bash "$script"
done
"""


def test_parallel_vbem_sge_backend(workdir, tmp_path):
    """BEER_PARALLEL=sge submits a qsub array per epoch and produces the
    same model as the local backend (driven through a qsub shim)."""
    import os
    import subprocess
    from pathlib import Path

    import jax

    from beer_tpu.utils import load_model

    root = workdir
    repo = Path(__file__).resolve().parents[1]
    script = repo / "recipes" / "lib" / "parallel_vbem.sh"
    bindir = tmp_path / "bin"
    bindir.mkdir()
    (bindir / "qsub").write_text(_FAKE_QSUB)
    (bindir / "qsub").chmod(0o755)

    def run(mode, out):
        env = os.environ.copy()
        env["PATH"] = f"{bindir}{os.pathsep}" + env["PATH"]
        env["BEER_PARALLEL"] = mode
        env["BEER_DEVICE"] = "cpu"
        env["PYTHONPATH"] = f"{repo}{os.pathsep}" + env.get("PYTHONPATH", "")
        r = subprocess.run(
            ["bash", str(script), str(root / "init.mdl"),
             str(root / "feats.npz"), str(out), "2", "1"],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        return load_model(Path(out) / "final.mdl")

    m_sge = run("sge", tmp_path / "sge")
    m_loc = run("local", tmp_path / "local")
    for a, b in zip(jax.tree.leaves(m_sge), jax.tree.leaves(m_loc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

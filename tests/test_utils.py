"""Utils: checkpoint round-trips, configs, NaN guards, metrics."""

import numpy as np
import jax
import jax.numpy as jnp

import beer_tpu
from beer_tpu import utils
from beer_tpu.vbi import vb_step


def test_checkpoint_roundtrip(rng, tmp_path):
    data = rng.normal(size=(100, 2))
    nset = beer_tpu.NormalSet.create(
        jnp.asarray(data.mean(0)), jnp.asarray(np.cov(data.T)),
        size=3, cov_type="full", key=jax.random.PRNGKey(0),
    )
    gmm = beer_tpu.Mixture.create(nset)
    _, gmm = vb_step(gmm, jnp.asarray(data))
    path = tmp_path / "model.mdl"
    utils.save_model(gmm, path)
    loaded = utils.load_model(path)
    for a, b in zip(jax.tree.leaves(gmm), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # loaded model trains further (static fields survived)
    elbo, _ = jax.jit(vb_step)(loaded, jnp.asarray(data))
    assert np.isfinite(float(elbo))


def test_latest_checkpoint(tmp_path):
    assert utils.latest_checkpoint(tmp_path) is None
    for i in (1, 3, 2):
        (tmp_path / f"epoch{i:04d}.mdl").write_bytes(b"x")
    assert utils.latest_checkpoint(tmp_path).name == "epoch0003.mdl"


def test_yaml_fallback(tmp_path):
    cfg = tmp_path / "c.yml"
    cfg.write_text("n_units: 20\ncov_type: diagonal\ndeltas: true\nlr: 0.5\n")
    out = utils.load_yaml(cfg)
    assert out == {"n_units": 20, "cov_type": "diagonal", "deltas": True,
                   "lr": 0.5}


def test_nan_guard_catches():
    def bad(x):
        return jnp.log(x)  # negative input -> nan

    guarded = jax.jit(utils.nan_guard(bad, "log"))
    err, _ = guarded(jnp.array([-1.0]))
    try:
        err.throw()
        raised = False
    except Exception:
        raised = True
    assert raised
    err, out = guarded(jnp.array([1.0]))
    err.throw()  # no error
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_metrics_logger(tmp_path):
    logger = utils.MetricsLogger(tmp_path, stdout=False)
    logger.log(0, elbo_per_frame=-4.2, frames_per_sec=1e6)
    logger.log(1, elbo_per_frame=-4.0, frames_per_sec=1.1e6)
    logger.close()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[1])
    assert rec["step"] == 1 and rec["elbo_per_frame"] == -4.0

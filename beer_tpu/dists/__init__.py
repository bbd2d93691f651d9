"""Conjugate exponential-family distributions (reference: ``beer/dists/``)."""

from beer_tpu.dists.basedist import ExpFamily, logdet_pd, sym, unvec, vec
from beer_tpu.dists.dirichlet import Beta, Dirichlet
from beer_tpu.dists.gamma import Gamma
from beer_tpu.dists.joint import (
    JointIsotropicNormalGamma,
    JointNormalGamma,
    JointNormalWishart,
)
from beer_tpu.dists.normalgamma import IsotropicNormalGamma, NormalGamma
from beer_tpu.dists.normalwishart import NormalWishart
from beer_tpu.dists.wishart import Wishart
from beer_tpu.dists import normallik

__all__ = [
    "ExpFamily",
    "Beta",
    "Dirichlet",
    "Gamma",
    "Wishart",
    "NormalGamma",
    "IsotropicNormalGamma",
    "NormalWishart",
    "JointNormalGamma",
    "JointIsotropicNormalGamma",
    "JointNormalWishart",
    "normallik",
    "logdet_pd",
    "sym",
    "vec",
    "unvec",
]

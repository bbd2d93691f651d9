"""Models (reference: ``beer/models/``)."""

from beer_tpu.models.basemodel import DiscreteLatentModel, Model
from beer_tpu.models.categorical import (Categorical, SBCategorical, SBCategoricalHyperPrior)
from beer_tpu.models.graph import (
    CompiledGraph,
    Graph,
    left_to_right,
    phone_loop_graph,
)
from beer_tpu.models.hmm import HMM
from beer_tpu.models.mixture import Mixture, MixtureSet
from beer_tpu.models.modelset import ModelSet
from beer_tpu.models.normal import Normal, NormalSet
from beer_tpu.models.parameters import BayesianParameter
from beer_tpu.models.phoneloop import PhoneLoop
from beer_tpu.models.ppca import PPCA
from beer_tpu.models.plda import PLDA
from beer_tpu.models.vae import VAE, make_vae_train_step
from beer_tpu.models.gsm import GSM, HierarchicalGSM, make_gsm_train_step

__all__ = [
    "Model",
    "DiscreteLatentModel",
    "ModelSet",
    "BayesianParameter",
    "Normal",
    "NormalSet",
    "Mixture",
    "MixtureSet",
    "Categorical",
    "SBCategorical",
    "SBCategoricalHyperPrior",
    "Graph",
    "CompiledGraph",
    "left_to_right",
    "phone_loop_graph",
    "HMM",
    "PhoneLoop",
    "PPCA",
    "PLDA",
    "VAE",
    "make_vae_train_step",
    "GSM",
    "HierarchicalGSM",
    "make_gsm_train_step",
]

from ilswiss_tpu.models.networks import MLP, FlattenMLP
from ilswiss_tpu.models import distributions
from ilswiss_tpu.models.policies import (
    TanhGaussianPolicy,
    GaussianPolicy,
    GaussianNoisePolicy,
    CategoricalPolicy,
)

from ilswiss_tpu.utils.pytree import soft_update, copy_params, tree_size
from ilswiss_tpu.utils.running_stats import (
    RunningMeanStd,
    running_mean_std_init,
    running_mean_std_update,
    normalize,
    unnormalize,
)

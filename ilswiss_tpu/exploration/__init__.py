from ilswiss_tpu.exploration.strategies import (
    OUState,
    ou_init,
    ou_noise,
    gaussian_noise,
    epsilon_greedy,
)

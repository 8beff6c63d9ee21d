from ilswiss_tpu.algorithms.sac import SAC, SACConfig, SACState

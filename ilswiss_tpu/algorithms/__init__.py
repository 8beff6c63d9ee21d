from ilswiss_tpu.algorithms.sac import SAC, SACConfig, SACState
from ilswiss_tpu.algorithms.sac_v import SACV, SACVConfig, SACVState
from ilswiss_tpu.algorithms.td3 import TD3, TD3Config, TD3State
from ilswiss_tpu.algorithms.ddpg import DDPG, DDPGConfig, DDPGState
from ilswiss_tpu.algorithms.discrete_sac import (
    DiscreteSAC, DiscreteSACConfig, DiscreteSACState,
)
from ilswiss_tpu.algorithms.dqn import DQN, DQNConfig, DQNState

from ilswiss_tpu.data.replay import (
    ReplayState,
    replay_init,
    replay_add,
    replay_sample,
)
from ilswiss_tpu.data.rollout import gae

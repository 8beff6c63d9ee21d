from ilswiss_tpu.parallel.mesh import make_mesh, ENV_AXIS, DATA_AXIS
from ilswiss_tpu.parallel.distributed import DistributedOffPolicyRunner

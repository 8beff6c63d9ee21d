from ilswiss_tpu.launchers.variant import (
    build_variants, check_exp_spec_format, flatten_dict, unflatten_dict,
)

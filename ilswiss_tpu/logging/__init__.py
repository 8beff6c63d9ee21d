from ilswiss_tpu.logging.logger import Logger

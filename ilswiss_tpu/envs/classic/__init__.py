from ilswiss_tpu.envs.classic.pendulum import Pendulum
from ilswiss_tpu.envs.classic.cartpole import CartPole
from ilswiss_tpu.envs.classic.mountain_car import MountainCarContinuous

"""Environment layer: the EnvList interface, a deterministic fake backend
for CI, the Libero/MuJoCo adapter, and the name registry."""

from v2a_tpu.envs.base import EnvList
from v2a_tpu.envs.fake import FakeEnvList
from v2a_tpu.envs.registration import make_env_list, register_env_list

__all__ = ["EnvList", "FakeEnvList", "make_env_list", "register_env_list"]

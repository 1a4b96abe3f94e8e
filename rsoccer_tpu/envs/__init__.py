from rsoccer_tpu.envs.base import Env
from rsoccer_tpu.envs.vss import VSSEnv
from rsoccer_tpu.envs.ssl_static_defenders import SSLStaticDefendersEnv
from rsoccer_tpu.envs.ssl_dribbling import SSLDribblingEnv
from rsoccer_tpu.envs.ssl_contested_possession import SSLContestedPossessionEnv
from rsoccer_tpu.envs.ssl_pass_endurance import SSLPassEnduranceEnv

__all__ = [
    "Env",
    "VSSEnv",
    "SSLStaticDefendersEnv",
    "SSLDribblingEnv",
    "SSLContestedPossessionEnv",
    "SSLPassEnduranceEnv",
]

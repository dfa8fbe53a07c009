from ai_economist_tpu.scenarios.rbc.env import RBCConfig, RBCEnvironment  # noqa: F401
from ai_economist_tpu.scenarios.rbc.trainer import RBCTrainConfig, RBCTrainer  # noqa: F401

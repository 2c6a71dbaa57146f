from mccnn_tpu.utils.config import MatchConfig, NetConfig, TrainConfig  # noqa: F401

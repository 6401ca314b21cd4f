from eelunet_tpu.train.state import TrainState, create_train_state
from eelunet_tpu.train.trainer import Trainer

__all__ = ["TrainState", "create_train_state", "Trainer"]

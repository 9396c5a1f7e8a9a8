from paddlerec_tpu.train.state import TrainState
from paddlerec_tpu.train.trainer import Trainer

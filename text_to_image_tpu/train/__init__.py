from text_to_image_tpu.train.state import TrainState  # noqa: F401
from text_to_image_tpu.train.steps import init_train_state, make_train_step  # noqa: F401
from text_to_image_tpu.train.trainer import Trainer  # noqa: F401

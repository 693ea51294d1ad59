from regda_tpu.train.state import TrainState, create_train_state, make_optimizer
from regda_tpu.train import steps

from tdwss.engine.steps import TrainState, make_eval_step, make_train_step  # noqa: F401
from tdwss.engine.train import Trainer  # noqa: F401
from tdwss.engine.evaluate import validate  # noqa: F401

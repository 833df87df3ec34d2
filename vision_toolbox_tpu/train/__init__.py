from .classifier import ImageClassifier, accuracy, cross_entropy  # noqa: F401
from .optim import sgd_with_param_groups, warmup_cosine_schedule  # noqa: F401
from .step import TrainState, make_eval_step, make_train_step, shard_train_step  # noqa: F401

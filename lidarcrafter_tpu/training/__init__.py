from .ema import ema_decay_schedule, ema_update  # noqa: F401
from .optim import cosine_warmup_schedule, make_optimizer  # noqa: F401
from .state import TrainState  # noqa: F401
from .factory import build_diffusion_training, layout_condition_batch  # noqa: F401
from .train_step import make_train_step  # noqa: F401

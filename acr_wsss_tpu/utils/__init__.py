from acr_wsss_tpu.utils.meters import AverageMeter, Timer, Logger  # noqa: F401
from acr_wsss_tpu.utils.metrics import Evaluator  # noqa: F401

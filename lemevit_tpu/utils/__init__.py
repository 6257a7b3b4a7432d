from lemevit_tpu.utils.meters import AverageMeter, MetricTracker  # noqa: F401
from lemevit_tpu.utils.logging import setup_logging, TeeLogger  # noqa: F401
from lemevit_tpu.utils.parser import parse_args_with_config  # noqa: F401

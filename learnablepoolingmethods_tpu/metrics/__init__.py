"""Evaluation metrics subpackage (ref: eval_util.py and calculators)."""

from learnablepoolingmethods_tpu.metrics.average_precision_calculator import (  # noqa: F401
    AveragePrecisionCalculator,
)
from learnablepoolingmethods_tpu.metrics.mean_average_precision_calculator import (  # noqa: F401
    MeanAveragePrecisionCalculator,
)
from learnablepoolingmethods_tpu.metrics import eval_util  # noqa: F401

"""Model zoo: importing this package registers every model by class name.

(ref: train.py dispatches ``--model`` over frame_level_models +
video_level_models; the rebuild's registry serves the same contract.)
"""

from learnablepoolingmethods_tpu.models.base import (  # noqa: F401
    BaseModel,
    create_model,
    find_class_by_name,
    list_models,
    register_model,
)
from learnablepoolingmethods_tpu.models import video_level  # noqa: F401
from learnablepoolingmethods_tpu.models import frame_level  # noqa: F401
from learnablepoolingmethods_tpu.models import attention  # noqa: F401
from learnablepoolingmethods_tpu.models import model_utils  # noqa: F401
from learnablepoolingmethods_tpu.models import modules  # noqa: F401

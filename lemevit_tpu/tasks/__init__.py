from lemevit_tpu.tasks.upernet import (  # noqa: F401
    FCNHead,
    UPerHead,
    UperNet,
    slide_inference,
)
from lemevit_tpu.tasks.change_detection import (  # noqa: F401
    BITChangeDetector,
    BITHead,
)
from lemevit_tpu.tasks.detection import (  # noqa: F401
    FPN,
    OBBRoIHead,
    OrientedRCNN,
    OrientedRPNHead,
    decode_midpoint_offset,
    decode_obb_deltas,
    encode_obb_deltas,
    make_anchors,
)

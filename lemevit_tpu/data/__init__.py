from lemevit_tpu.data.datasets import (  # noqa: F401
    AIDDataset,
    CDPairDataset,
    ImageFolderDataset,
    ManifestDataset,
    MillionAIDDataset,
    NWPURESISCDataset,
    SyntheticDataset,
    UCMDataset,
    ZipImageFolder,
    create_dataset,
)
from lemevit_tpu.data.loader import Loader, create_loader  # noqa: F401
from lemevit_tpu.data.mixup import mixup_cutmix, random_erasing  # noqa: F401
from lemevit_tpu.data.transforms import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    build_eval_transform,
    build_train_transform,
)

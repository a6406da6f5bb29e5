from beat_this_tpu.data.dataset import (  # noqa: F401
    BeatDataModule,
    BeatTrackingDataset,
    prepare_annotations,
)
from beat_this_tpu.data.mmnpz import MemmappedNpz  # noqa: F401

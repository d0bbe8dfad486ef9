from sparch_tpu.data.loader import DataLoader  # noqa: F401
from sparch_tpu.data.spiking import SpikingDataset, load_shd_or_ssc  # noqa: F401
from sparch_tpu.data.audio import (  # noqa: F401
    HeidelbergDigits,
    SpeechCommands,
    load_hd_or_sc,
    read_wav,
)

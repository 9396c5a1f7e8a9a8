from paddlerec_tpu.data.schema import SlotSchema, schema_from_config
from paddlerec_tpu.data.slot_reader import (
    SlotDataset,
    shard_files,
    list_data_files,
    prefetch_to_device,
)

from dr4sr_tpu.data.dataset import (  # noqa: F401
    RowData,
    SeqDataset,
    get_dataset_class,
    load_rows,
)
from dr4sr_tpu.data.loader import BatchIterator  # noqa: F401

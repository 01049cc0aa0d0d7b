from dr4sr_tpu.modules.layers import (  # noqa: F401
    FMLPEncoder,
    GRUStack,
    TransformerEncoder,
    TransformerEncoderLayer,
    seq_pooling,
)
from dr4sr_tpu.modules.losses import (  # noqa: F401
    binary_cross_entropy_loss,
    bpr_loss,
    info_nce_loss,
)

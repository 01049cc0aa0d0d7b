from dr4sr_tpu.models.registry import get_model_class, register_model  # noqa: F401
from dr4sr_tpu.models import sasrec, gru4rec, fmlp, cl4srec, gnn, metamodel, graph_cl, iclrec  # noqa: F401

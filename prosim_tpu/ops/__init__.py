from prosim_tpu.ops.mlp import MLP  # noqa: F401
from prosim_tpu.ops.fourier import FourierEmbeddingFix, FourierEmbedding  # noqa: F401
from prosim_tpu.ops.pointnet import PointNetPolylineEncoder  # noqa: F401
from prosim_tpu.ops.neighbors import neighbor_topk  # noqa: F401
from prosim_tpu.ops.attention import GatedNeighborAttention  # noqa: F401

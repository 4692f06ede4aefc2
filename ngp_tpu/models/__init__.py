from ngp_tpu.models.encodings import (
    CompositeEncoding,
    FrequencyEncoding,
    GridEncoding,
    IdentityEncoding,
    OneBlobEncoding,
    SphericalHarmonicsEncoding,
    TriangleWaveEncoding,
)
from ngp_tpu.models.mlp import MLP
from ngp_tpu.models.nerf_network import NerfNetwork
from ngp_tpu.models.factory import (
    create_encoding,
    create_loss,
    create_network,
    create_network_with_input_encoding,
    create_optimizer,
)

__all__ = [
    "GridEncoding",
    "SphericalHarmonicsEncoding",
    "FrequencyEncoding",
    "OneBlobEncoding",
    "TriangleWaveEncoding",
    "IdentityEncoding",
    "CompositeEncoding",
    "MLP",
    "NerfNetwork",
    "create_encoding",
    "create_network",
    "create_loss",
    "create_optimizer",
    "create_network_with_input_encoding",
]

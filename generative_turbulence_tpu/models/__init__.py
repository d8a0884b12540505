from .embeddings import NyquistFrequencyEmbedding, SinusoidalTimeEmbedding  # noqa: F401
from .normalization import Normalizer  # noqa: F401
from .conditioning import Conditioning  # noqa: F401
from .blocks import ConvBlock, ResnetBlock, VoxelAttention, UNet  # noqa: F401
from .unet import DenoisingModel  # noqa: F401
from .dilresnet import DilResNet  # noqa: F401
from .tfnet import TFNet  # noqa: F401

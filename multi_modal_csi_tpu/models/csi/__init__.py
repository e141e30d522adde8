"""CSI model family.

Coverage vs the reference (model key -> class), SURVEY.md §2.2:
  ST-RF                  -> strf.fit_predict_strf (sklearn-backed)
  MLP                    -> MLP
  LSTM                   -> LSTMModel
  CNN-1D                 -> CNN1D
  CNN-2D                 -> CNN2D
  CLSTM                  -> CLSTM
  ABLSTM                 -> ABLSTM
  THAT                   -> THAT
  THAT_MULTI_HEAD        -> THATMultiHead
  THAT_COUNT             -> THATCount
  THAT_COUNT_CONSTRAINED -> THATCountConstrained
  THAT_ENCODER           -> THATEncoderDETR
  DETR                   -> DETRMultiUser
  SSL                    -> SSLModel
  dual_band              -> DualBandCNN
"""

from .ablstm import ABLSTM
from .clstm import CLSTM
from .cnn_1d import CNN1D
from .cnn_2d import CNN2D
from .detr import DETRMultiUser
from .dual_band import DualBandCNN
from .lstm import LSTMModel
from .mlp import MLP
from .ssl import SSLModel, info_nce, ssl_loss, two_views
from .strf import fit_predict_strf, spectrogram_features
from .that import THAT, THATCount, THATCountConstrained, THATMultiHead
from .that_encoder import THATEncoderDETR

__all__ = [
    "ABLSTM", "CLSTM", "CNN1D", "CNN2D", "DETRMultiUser", "DualBandCNN",
    "LSTMModel", "MLP", "SSLModel", "THAT", "THATCount",
    "THATCountConstrained", "THATMultiHead", "THATEncoderDETR",
    "fit_predict_strf", "spectrogram_features", "info_nce", "ssl_loss",
    "two_views",
]

"""Video model family.

Coverage vs the reference (benchmark/video/model/, SURVEY.md §2.3):
  ResNet  -> ResNet3D18   (r3d_18)
  S3D     -> S3D
  MViT-v1 -> mvit_v1_b    (MViT variant="v1")
  MViT-v2 -> mvit_v2_s    (MViT variant="v2")
  Swin-T  -> swin3d_t     (Swin3D depths (2,2,6,2))
  Swin-S  -> swin3d_s     (Swin3D depths (2,2,18,2))
"""

from .mvit import MViT, mvit_v1_b, mvit_v2_s
from .resnet3d import ResNet3D18
from .s3d import S3D
from .swin3d import Swin3D, swin3d_s, swin3d_t

__all__ = ["MViT", "ResNet3D18", "S3D", "Swin3D",
           "mvit_v1_b", "mvit_v2_s", "swin3d_s", "swin3d_t"]

from .objects import (  # noqa: F401
    Sphere, MovingSphere, Rect, Box, Translate, RotateY, FlipNormals,
    ConstantMedium, Bezier, Klein,
    Lambertian, Metal, Dielectric, DiffuseLight, Isotropic,
    ConstantTexture, CheckerTexture, NoiseTexture, MarbleTexture, ImageTexture,
)
from .build import Scene, compile_scene  # noqa: F401

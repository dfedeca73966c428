from .hit import scene_hit, HitRec  # noqa: F401
from .wavefront import trace_rays  # noqa: F401

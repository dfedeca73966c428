from . import vecmath  # noqa: F401
from . import rng  # noqa: F401

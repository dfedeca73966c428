from .mesh import make_mesh  # noqa: F401
from .render import render_sharded, train_step  # noqa: F401

from .checks import checked_render_image  # noqa: F401

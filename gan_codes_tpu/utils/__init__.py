from . import image_io, plotting  # noqa: F401
from .seeding import fix_seed  # noqa: F401

from .intersect import Hit, intersect_scene  # noqa: F401
from .materials import scatter, sky_color  # noqa: F401
from .sampling import (  # noqa: F401
    ray_keys,
    bounce_noise,
    unit_vectors,
    in_sphere_vectors,
)

from . import contextual_attention, edges, flow_viz, geometry, image, native_geometry  # noqa: F401

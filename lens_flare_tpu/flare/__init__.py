from .starburst import starburst_field, irradiance_falloff  # noqa: F401

from .aperture import ApertureTexture  # noqa: F401
from .prescription import LensPrescription, reference_prescription  # noqa: F401

"""Model zoo. Importing this package populates the MODELS registry with every
registered family (SCD/TSCD, WaveCAM ResNet, IRN, RML, DCL, RSSFormer + baselines,
smp-equivalent zoo, ASFF variants)."""
from . import (  # noqa: F401
    asff,
    baselines,
    dcl,
    irn,
    resnet,
    rml,
    rssformer,
    smp_zoo,
    tscd,
    wavecam,
)

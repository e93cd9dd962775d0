"""spider-tpu: a TPU-native (JAX/XLA/Pallas/pjit) any-to-many multimodal LLM
framework with the capabilities of Layjins/Spider (arXiv:2411.09439).

Importing the package registers all models / tasks / builders / runners with
the global registry (mirroring /root/reference/spider/__init__.py:13-18).
"""

__version__ = "0.1.0"

from spider_tpu.common.registry import registry  # noqa: F401
from spider_tpu.common.config import Config  # noqa: F401


def register_all() -> None:
    """Import every submodule that self-registers with the registry.

    Kept lazy (not at package import) so that light-weight uses — e.g. the tag
    parser — do not pay for model imports.
    """
    import spider_tpu.models  # noqa: F401
    import spider_tpu.tasks  # noqa: F401
    import spider_tpu.datasets  # noqa: F401
    import spider_tpu.runners  # noqa: F401

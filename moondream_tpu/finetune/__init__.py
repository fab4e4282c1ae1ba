from . import trainer  # noqa: F401


def resolve_config(spec):
    """--config value: None/'2b' and '05b' presets, else a JSON path."""
    from ..config import MOONDREAM_05B, MOONDREAM_2B, MoondreamConfig

    if spec in (None, "", "2b"):
        return MOONDREAM_2B
    if spec == "05b":
        return MOONDREAM_05B
    if spec == "tiny":  # offline smoke runs / CI
        from ..config import tiny_test_config

        return tiny_test_config()
    return MoondreamConfig.from_json(spec)

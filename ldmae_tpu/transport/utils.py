"""Small transport utilities (reference transport/utils.py:3-28)."""

from __future__ import annotations


class EasyDict(dict):
    """Attribute-access dict (utils.py:5-15)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


def log_state(state) -> str:
    """Readable dump of a transport/sampler object's config (utils.py:19-28)."""
    lines = [f"{type(state).__name__}:"]
    for k, v in sorted(vars(state).items()):
        if not callable(v) and not k.startswith("_"):
            lines.append(f"  {k}: {v}")
    return "\n".join(lines)

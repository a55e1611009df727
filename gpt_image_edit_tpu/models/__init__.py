"""Model zoo registry (mirrors ref:univa/models/__init__.py MODEL_TYPE)."""

MODEL_TYPE = {}


def register_model(name):
    def _wrap(cls):
        MODEL_TYPE[name] = cls
        return cls

    return _wrap

"""Component registry.

Decorator-based plugin registry covering the same component axes as the
reference framework (reference: prosim/core/registry.py:25-138): datasets,
metrics, models, scene encoders, prompt encoders, decoders, policies, plus
condition encoders/attentions which the reference wires through module-level
dicts.
"""

from typing import Any, Callable, Dict, Optional


class Registry:
    _groups: Dict[str, Dict[str, Any]] = {}

    @classmethod
    def _register(cls, group: str, name: Optional[str], obj: Any = None):
        mapping = cls._groups.setdefault(group, {})

        def wrap(to_register):
            key = name if name is not None else to_register.__name__
            if key in mapping and mapping[key] is not to_register:
                raise KeyError(f"{group}:{key} already registered")
            mapping[key] = to_register
            return to_register

        if obj is None:
            return wrap
        return wrap(obj)

    # -- registration decorators -------------------------------------------------
    def register_model(self, name=None):
        return self._register("model", name)

    def register_dataset(self, name=None):
        return self._register("dataset", name)

    def register_metric(self, name=None):
        return self._register("metric", name)

    def register_scene_encoder(self, name=None):
        return self._register("scene_encoder", name)

    def register_prompt_encoder(self, name=None):
        return self._register("prompt_encoder", name)

    def register_decoder(self, name=None):
        return self._register("decoder", name)

    def register_policy(self, name=None):
        return self._register("policy", name)

    def register_condition_encoder(self, name=None):
        return self._register("condition_encoder", name)

    def register_condition_attn(self, name=None):
        return self._register("condition_attn", name)

    def register_text_attn(self, name=None):
        return self._register("text_attn", name)

    def register_loss(self, name=None):
        return self._register("loss", name)

    # -- lookups -------------------------------------------------------------------
    def _get(self, group: str, name: str) -> Callable:
        mapping = self._groups.get(group, {})
        if name not in mapping:
            known = sorted(mapping)
            raise KeyError(f"unknown {group} '{name}'; registered: {known}")
        return mapping[name]

    def get_model(self, name):
        return self._get("model", name)

    def get_dataset(self, name):
        return self._get("dataset", name)

    def get_metric(self, name):
        return self._get("metric", name)

    def get_scene_encoder(self, name):
        return self._get("scene_encoder", name)

    def get_prompt_encoder(self, name):
        return self._get("prompt_encoder", name)

    def get_decoder(self, name):
        return self._get("decoder", name)

    def get_policy(self, name):
        return self._get("policy", name)

    def get_condition_encoder(self, name):
        return self._get("condition_encoder", name)

    def get_condition_attn(self, name):
        return self._get("condition_attn", name)

    def get_text_attn(self, name):
        return self._get("text_attn", name)

    def get_loss(self, name):
        return self._get("loss", name)

    def list(self, group: str):
        return sorted(self._groups.get(group, {}))


registry = Registry()

"""Configuration format registry + JSON-schema validation.

Python counterpart of the reference's IO/Formats.jl (extension-keyed parser
registry for YAML/TOML) and of the schema gate in IO/Parameters.jl: every
config dict is validated against the vendored reference schema
(schemas/vsmartmom-parameters.schema.json, a data fixture with
``additionalProperties: false``) before parsing, so typos in section or key
names fail loudly instead of being silently ignored.
"""

import functools
import json
import os

_SCHEMA_PATH = os.path.join(os.path.dirname(__file__), "..", "data",
                            "vsmartmom-parameters.schema.json")

_format_registry = {}


def register_format(ext: str, parser) -> None:
    """Register ``parser(path) -> dict`` for a file extension ('.yaml')."""
    _format_registry[ext.lower()] = parser


def _load_yaml(path: str) -> dict:
    import yaml
    with open(path) as f:
        return yaml.safe_load(f)


def _load_toml(path: str) -> dict:
    import tomllib
    with open(path, "rb") as f:
        return tomllib.load(f)


register_format(".yaml", _load_yaml)
register_format(".yml", _load_yaml)
register_format(".toml", _load_toml)
register_format(".json", lambda p: json.load(open(p)))


def load_config(path: str) -> dict:
    """Load a configuration dict from a YAML/TOML/JSON file by extension."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in _format_registry:
        raise ValueError(f"No parser registered for extension: {ext!r} "
                         f"(known: {sorted(_format_registry)})")
    return _format_registry[ext](path)


@functools.lru_cache(maxsize=1)
def _schema():
    with open(os.path.normpath(_SCHEMA_PATH)) as f:
        return json.load(f)


def validate_config(d: dict) -> None:
    """Validate a config dict against the reference JSON schema.

    Raises ``ValueError`` with the schema error message on failure. The
    schema forbids unknown keys at every level (additionalProperties:false),
    the reference's defense against silently-ignored typos.
    """
    import jsonschema
    try:
        jsonschema.validate(d, _schema())
    except jsonschema.ValidationError as e:
        path = "/".join(str(p) for p in e.absolute_path) or "<root>"
        raise ValueError(
            f"config failed schema validation at {path}: {e.message}") from e

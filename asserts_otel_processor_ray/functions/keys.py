"""Key formatting and Prometheus label sanitization.

Semantics mirror the reference processor:

* entity key string — ``assertsprocessor/keys.go:13-30`` (scope keys sorted;
  golden value ``{env=dev, namespace=platform, site=us-west-2}#Service#api-server``
  from ``assertsprocessor/sampler_test.go:129``).
* service key — ``assertsprocessor/utils.go:9-15``.
* request key — ``assertsprocessor/keys.go:32-39``.
* prom sanitization — ``assertsprocessor/utils.go:140-158``.
"""

from __future__ import annotations

ENTITY_TYPE_SERVICE = "Service"

# Target-attribute names (reference: assertsprocessor/span_enrichment.go:11-18).
ATTR_ERROR_TYPE = "asserts.error.type"
ATTR_REQUEST_TYPE = "asserts.request.type"
ATTR_REQUEST_CONTEXT = "asserts.request.context"
ATTR_SAMPLE_TYPE = "asserts.sample.type"

REQUEST_TYPE_INBOUND = "inbound"
REQUEST_TYPE_OUTBOUND = "outbound"
REQUEST_TYPE_INTERNAL = "internal"

SAMPLE_TYPE_NORMAL = "normal"
SAMPLE_TYPE_SLOW = "slow"
SAMPLE_TYPE_ERROR = "error"

# Span kinds (role → kind mapping lives in PipelineConfig.role_kind_map).
KIND_SERVER = "Server"
KIND_CLIENT = "Client"
KIND_PRODUCER = "Producer"
KIND_CONSUMER = "Consumer"
KIND_INTERNAL = "Internal"


def attr_column(target_attr: str) -> str:
    """Arrow column name for a (possibly dotted) target attribute name."""
    return target_attr.replace(".", "_")


def service_key(namespace: str, service: str) -> str:
    """``namespace#service`` or bare service when namespace empty
    (assertsprocessor/utils.go:9-15)."""
    if namespace:
        return namespace + "#" + service
    return service


def entity_key_string(env: str, site: str, namespace: str, service: str) -> str:
    """Deterministic entity key with sorted scope keys
    (assertsprocessor/keys.go:13-30).  The scope map is always
    {env, site, namespace}, whose sorted key order is env, namespace, site.
    """
    return (
        "{env=" + env + ", namespace=" + namespace + ", site=" + site + "}"
        + "#" + ENTITY_TYPE_SERVICE + "#" + service
    )


def request_key_string(entity_key: str, request: str) -> str:
    """``entityKey#request`` (assertsprocessor/keys.go:36-39)."""
    return entity_key + "#" + request


_PROM_REPLACEMENTS = [
    (" ", "_"), (",", "_"), ("\t", "_"), ("/", "_"), ("\\", "_"),
    (".", "_"), ("-", "_"), (":", "_"), ("=", "_"), ("“", "_"),
    ("@", "_"), ("<", "_"), (">", "_"), ("%", "_percent"),
]


def apply_prom_conventions(text: str) -> str:
    """Sanitize a label name exactly like assertsprocessor/utils.go:140-158
    (replace then lowercase)."""
    for old, new in _PROM_REPLACEMENTS:
        text = text.replace(old, new)
    return text.lower()

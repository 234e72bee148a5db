"""Ports of the reference's key/label golden expectations
(assertsprocessor/keys.go, utils.go:140-158, sampler_test.go:129)."""

from asserts_otel_processor_ray.functions.keys import (
    apply_prom_conventions,
    attr_column,
    entity_key_string,
    request_key_string,
    service_key,
)


def test_entity_key_golden():
    # golden string from assertsprocessor/sampler_test.go:129
    assert entity_key_string("dev", "us-west-2", "platform", "api-server") \
        == "{env=dev, namespace=platform, site=us-west-2}#Service#api-server"


def test_entity_key_empty_namespace():
    assert entity_key_string("dev", "us-west-2", "", "svc") \
        == "{env=dev, namespace=, site=us-west-2}#Service#svc"


def test_request_key():
    ek = entity_key_string("dev", "s", "n", "svc")
    assert request_key_string(ek, "/api/foo") == ek + "#/api/foo"


def test_service_key():
    # assertsprocessor/utils.go:9-15
    assert service_key("robot-shop", "cart") == "robot-shop#cart"
    assert service_key("", "cart") == "cart"


def test_prom_conventions():
    # assertsprocessor/utils.go:140-158: replace then lowercase
    assert apply_prom_conventions("asserts.request.context") \
        == "asserts_request_context"
    assert apply_prom_conventions("A b,c\td/e\\f.g-h:i=j@k<l>m") \
        == "a_b_c_d_e_f_g_h_i_j_k_l_m"
    assert apply_prom_conventions("cpu%") == "cpu_percent"


def test_attr_column():
    assert attr_column("asserts.error.type") == "asserts_error_type"
    assert attr_column("plain") == "plain"

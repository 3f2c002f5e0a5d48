"""Parity against the reference's own custom integration fixture
(/root/reference/tests/custom.rs + tests/custom/t01-in.jsonld): a
real-world W3C Verifiable Credentials presentation processed with the
vendored https://www.w3.org/2018/credentials/v1 and
https://w3id.org/security/suites/jws-2020/v1 contexts via FsLoader
mounts — exercising chained remote contexts, @protected terms, scoped
contexts and the @graph container (the proof lands in a bnode-named
graph) in one document. The reference test only asserts to_rdf
completes (it exists to pin stack depth, custom.rs:44); here the full
expected quad set is pinned.

Skipped when the reference checkout is absent (the repo stays
standalone)."""

import json
import os

import pytest

REF = "/root/reference/tests/custom"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

CRED = "https://www.w3.org/2018/credentials#"
SEC = "https://w3id.org/security#"
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
XSD_S = "http://www.w3.org/2001/XMLSchema#string"
PRES = "http://example.org/presentations/3731"
VC = "http://example.org/credentials/3731"


def test_vc_presentation_to_rdf_matches_reference_fixture():
    from json_ld_spark.api import to_rdf
    from json_ld_spark.context import fs_loader
    from json_ld_spark.options import JsonLdOptions

    loader = fs_loader({
        "https://www.w3.org/": f"{REF}/extern/www.w3.org/",
        "https://w3id.org/": f"{REF}/extern/w3id.org/",
    })
    doc = json.load(open(f"{REF}/t01-in.jsonld"))
    quads = {tuple(q) for q in to_rdf(doc, options=JsonLdOptions(loader=loader))}

    jws = (
        "eyJhbGciOiJQUzI1NiIsImNyaXQiOlsiYjY0Il0sImI2NCI6ZmFsc2V9..FZnNxoBFNn"
        "gy65EI_jUP8COAgk_kPF2NiKEkM5F3GOGO9vXzfeUHTMWxPHerEeVnYR89auQnMc-dTN"
        "HFe9cizSfTDnvFdQ51Z8F5kY5NHaRVpfoCtiPFKp2j69i7Sm5aZg-72OSInax6p3n8IQ"
        "jFVGGx0AmVkIxzPnwSTYqgch4zM_kvm5mCmOdJm-saiQtgcXUblR0DiN1bhnp2bFG4qA"
        "dpLsGm7wfcy5W0Opcztex_UPI2e83NGbRLCfOcGq1SQKMb91pc9uQLBE5tKOqGSI8TB5"
        "oQLUkdkrGxj6Wdr91Mo8bJh8FFRNVegKWSpUg1FJulFqCPj5nqyZ0AveokCw"
    )
    expected = {
        (None, PRES, TYPE, "iri", CRED + "VerifiablePresentation", None, None),
        (None, PRES, CRED + "holder", "iri", "did:example:foo", None, None),
        (None, PRES, CRED + "verifiableCredential", "bnode", "_:b0", None, None),
        ("_:b0", VC, TYPE, "iri", CRED + "VerifiableCredential", None, None),
        ("_:b0", VC, SEC + "proof", "bnode", "_:b1", None, None),
        ("_:b0", VC, CRED + "credentialSubject", "iri",
         "did:example:d23dd687a7dc6787646f2eb98d0", None, None),
        ("_:b0", VC, CRED + "issuanceDate", "literal",
         "2020-08-19T21:41:50Z", XSD_DT, None),
        ("_:b0", VC, CRED + "issuer", "iri", "did:example:foo", None, None),
        # the proof object lives in a named graph (@container: @graph in
        # the security context); its graph name is the sec:proof bnode
        ("_:b1", "_:b2", TYPE, "iri", SEC + "JsonWebSignature2020", None, None),
        ("_:b1", "_:b2", "http://purl.org/dc/terms/created", "literal",
         "2023-01-11T14:28:53.514Z", XSD_DT, None),
        ("_:b1", "_:b2", SEC + "jws", "literal", jws, XSD_S, None),
        ("_:b1", "_:b2", SEC + "proofPurpose", "iri",
         SEC + "assertionMethod", None, None),
        ("_:b1", "_:b2", SEC + "verificationMethod", "iri",
         "did:example:foo#key1", None, None),
    }
    assert quads == expected

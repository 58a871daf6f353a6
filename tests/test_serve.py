"""Upload endpoint (S5): in-process port of the reference webui's
POST /upload (SchemaGuruRoutes.scala:35-59, ProcessSpec.scala:37-46),
driven through a REAL multipart/form-data body — no sockets needed."""

import json


def _multipart(fields):
    """fields: [(name, content)] → (content_type, body bytes)."""
    boundary = "testboundary42"
    lines = []
    for name, content in fields:
        lines.append(f"--{boundary}")
        lines.append(f'Content-Disposition: form-data; name="{name}"')
        lines.append("")
        lines.append(content)
    lines.append(f"--{boundary}--")
    lines.append("")
    return (
        f"multipart/form-data; boundary={boundary}",
        "\r\n".join(lines).encode(),
    )


class TestUpload:
    def test_process_request_with_json(self):
        """ProcessSpec.scala:37-46: one *.json part → object schema."""
        from schema_guru_ray.serve import handle_upload

        ct, body = _multipart(
            [("test.json", '{"referrer":"127.0.0.1", "id":42 }')]
        )
        res = handle_upload(ct, body)
        assert res["status"] == "processed"
        assert res["schema"]["type"] == "object"
        props = res["schema"]["properties"]
        assert props["referrer"]["format"] == "ipv4"
        assert props["id"]["type"] == "integer"
        assert res["errors"] == []

    def test_ndjson_part_and_cardinality(self):
        """Non-.json field names are NDJSON (HttpJsonGetters.scala:44-57);
        enumCardinality is an option, not data."""
        from schema_guru_ray.serve import handle_upload

        nd = "\n".join(json.dumps({"color": c}) for c in ("red", "blue", "red"))
        ct, body = _multipart([("batch.ndjson", nd), ("enumCardinality", "4")])
        res = handle_upload(ct, body)
        assert res["status"] == "processed"
        assert sorted(res["schema"]["properties"]["color"]["enum"]) == ["blue", "red"]

    def test_parse_errors_carry_file_name(self):
        from schema_guru_ray.serve import handle_upload

        ct, body = _multipart([("bad.json", "{not json"), ("ok.json", '{"a": 1}')])
        res = handle_upload(ct, body)
        assert res["schema"]["properties"]["a"]["type"] == "integer"
        assert len(res["errors"]) == 1
        assert res["errors"][0]["file"] == "bad.json"

    def test_ndjson_errors_carry_line_numbers(self):
        from schema_guru_ray.serve import handle_upload

        ct, body = _multipart([("data", '{"a": 1}\nnope\n{"a": 2}')])
        res = handle_upload(ct, body)
        assert len(res["errors"]) == 1
        assert "line 1" in res["errors"][0]["error"]

    def test_duplicate_key_warning(self):
        from schema_guru_ray.serve import handle_upload

        ct, body = _multipart(
            [("a.json", '{"userName": 1, "user_name": 2}')]
        )
        res = handle_upload(ct, body)
        assert res["warning"] is not None
        assert ["userName", "user_name"] in res["warning"]["items"] or [
            "user_name",
            "userName",
        ] in res["warning"]["items"]

    def test_rejects_non_multipart(self):
        import pytest

        from schema_guru_ray.serve import handle_upload

        with pytest.raises(ValueError):
            handle_upload("application/json", b"{}")


class TestStatic:
    """Static web-UI routes (SchemaGuruRoutes.scala:63-75 rootRoute:
    index ~ staticJs ~ staticCss ~ upload)."""

    def test_index(self):
        from schema_guru_ray.serve import handle_get

        status, ctype, body = handle_get("/")
        assert status == 200
        assert ctype.startswith("text/html")
        assert b"schema-guru" in body
        # same page at /index.html
        assert handle_get("/index.html")[:1] == (200,)

    def test_dist_and_css(self):
        from schema_guru_ray.serve import handle_get

        status, ctype, body = handle_get("/dist/app.js")
        assert status == 200 and ctype.startswith("application/javascript")
        assert b"/upload" in body  # the page actually drives the S5 pipeline
        status, ctype, _ = handle_get("/css/app.css")
        assert status == 200 and ctype.startswith("text/css")

    def test_unknown_paths_404(self):
        from schema_guru_ray.serve import handle_get

        for p in ("/nope", "/dist/missing.js", "/upload", "/web/index.html"):
            assert handle_get(p)[0] == 404

    def test_traversal_is_blocked(self):
        from schema_guru_ray.serve import handle_get

        assert handle_get("/dist/../../serve.py")[0] == 404
        assert handle_get("/css/../index.html")[0] in (200, 404)  # stays in root
        assert handle_get("/dist/../../../etc/passwd")[0] == 404

"""WAT metadata-sidecar export (operators/extract.py:wat_records):
framing, JSON escaping, Content-Length octets, NULL folding."""


def test_wat_record_framing_and_escaping(spark):
    import datetime as dt
    import json

    from doc_parser_spark.operators.extract import wat_records

    df = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 2, 3, 4, 5),
          'He said "hi" \\ there', "d\t1", 3)],
        "url string, warc_ts timestamp, title string,"
        " meta_description string, n_links int",
    )
    rec = wat_records(df).collect()[0].wat_record
    head, _, rest = rec.partition("\r\n\r\n")
    body = rest[: -4]  # strip trailing CRLF CRLF
    # Content-Length counts the JSON body octets
    cl = [ln for ln in head.split("\r\n") if ln.startswith("Content-Length")]
    assert cl == [f"Content-Length: {len(body.encode('utf-8'))}"]
    assert "WARC-Type: metadata" in head
    env = json.loads(body)["Envelope"]
    assert env["Format"] == "WARC"
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "u1"
    assert env["WARC-Header-Metadata"]["WARC-Date"] == "2024-01-02T03:04:05Z"
    hm = env["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == 'He said "hi" \\ there'
    assert hm["Head"]["Meta-Description"] == "d\t1"
    assert hm["Links-Count"] == 3


def test_wat_record_null_folding(spark):
    import datetime as dt
    import json

    from doc_parser_spark.operators.extract import wat_records

    df = spark.createDataFrame(
        [("u2", dt.datetime(2024, 6, 1), None, None, None)],
        "url string, warc_ts timestamp, title string,"
        " meta_description string, n_links int",
    )
    rec = wat_records(df).collect()[0].wat_record
    env = json.loads(rec.partition("\r\n\r\n")[2][:-4])["Envelope"]
    hm = env["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"] == {"Title": "", "Meta-Description": ""}
    assert hm["Links-Count"] == 0

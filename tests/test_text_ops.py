

def test_html_extraction_edges(spark):
    from tinyerp_etl_spark.operators import text as X

    rows = [
        (1, '<html><head><title> A  B </title><script>x</script></head>'
            '<body><p>one</p><div>two</div></body></html>'),
        (2, 'no markup at all'),
        (3, '<body><script a="b">var x = "<p>hidden</p>";</script>'
            'kept &amp; &lt;tag&gt; &#39;q&#39;</body>'),
        (4, ''),
        (5, '<ul><li>a</li><li>b</li></ul><a href="u1">x</a>'
            '<A HREF="u2">y</A>'),
    ]
    df = spark.createDataFrame(rows, "id long, page string").select(
        "id",
        X.html_to_text("page").alias("t"),
        X.html_title("page").alias("title"),
        X.html_links("page").alias("links"),
    )
    got = {r["id"]: r for r in df.collect()}
    # head (incl. title text + script) drops with content; breaks keep
    # the one/two boundary a naive tag-strip would fuse
    assert got[1]["t"] == "one two"
    assert got[1]["title"] == "A B"
    assert got[2]["t"] == "no markup at all"
    # script CONTENT (live-looking markup inside a string) drops;
    # entities decode after stripping, &amp; last
    assert got[3]["t"] == "kept & <tag> 'q'"
    assert got[4]["t"] == "" and got[4]["title"] == ""
    assert got[5]["t"] == "a b x y"
    # href extraction is case-sensitive by design (lowercase html);
    # the uppercase variant is not matched
    assert got[5]["links"] == ["u1"]

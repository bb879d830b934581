package graft

/** Behavioral pins for the PII class detectors behind `docs_pii_scan`
  * ([[graft.queries.TextOps.piiScan]]): each class fires on its canonical
  * shape, boundary rules block word-adjacent look-alikes, the classes do
  * not cross-fire on each other's injections, and the total/flag columns
  * are consistent. */
class PiiScanSpec extends SparkSpec {

  private def scan(texts: String*): Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    graft.queries.TextOps.piiScan(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
  }

  test("each class fires on its canonical shape, and only that class") {
    val out = scan(
      "reach me at bob.smith+x@mail.example.org for details",
      "server 192.168.0.1 responded in time",
      "call 555-123-4567 before noon",
      "record id 123-45-6789 on file",
      "no personal information in this row at all")
    assert(out(0L) === ((1L, 0L, 0L, 0L, 1L, 1L)))
    assert(out(1L) === ((0L, 1L, 0L, 0L, 1L, 1L)))
    assert(out(2L) === ((0L, 0L, 1L, 0L, 1L, 1L)))
    assert(out(3L) === ((0L, 0L, 0L, 1L, 1L, 1L)))
    assert(out(4L) === ((0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("multiple hits in one document are all counted") {
    val out = scan("a@x.io then b@y.org then 10.0.0.1 and 10.0.0.2 done")
    assert(out(0L) === ((2L, 2L, 0L, 0L, 4L, 1L)))
  }

  test("word-adjacent look-alikes are blocked by the boundary rule") {
    val out = scan(
      "a10.0.0.17 is a version token, not an address",
      "x555-123-4567 is an order code, not a phone",
      "id123-45-6789z is a part number, not an ssn")
    assert(out.values.forall(_._6 == 0L),
      s"boundary rule leaked a match: $out")
  }

  test("phone and ssn shapes do not cross-fire (3-3-4 vs 3-2-4)") {
    val out = scan("call 555-123-4567 and file 123-45-6789 today")
    assert(out(0L) === ((0L, 0L, 1L, 1L, 2L, 1L)))
  }
}

SELECT CAST(bucket AS INT) AS bucket, CAST(doc_count AS BIGINT) AS doc_count, CAST(span_count AS BIGINT) AS span_count, status, run_id
FROM (VALUES
(0, 26, 243, 'committed', 'driver'),
(1, 25, 113, 'committed', 'driver'),
(2, 19, 103, 'committed', 'driver'),
(3, 23, 117, 'committed', 'driver'),
(4, 20, 92, 'committed', 'driver'),
(5, 27, 280, 'committed', 'driver'),
(6, 30, 572, 'committed', 'driver'),
(7, 30, 178, 'committed', 'driver')
) AS t(bucket, doc_count, span_count, status, run_id)

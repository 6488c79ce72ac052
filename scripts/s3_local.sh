#!/bin/bash
# Attempt a LIVE S3-compatible round-trip for the ShelfSpec env-skip test
# ("store round-trips against an S3-compatible endpoint").
#
# The reference CI runs its whole CLI suite against MinIO
# (reference tests/test_shelf.py:25-30); this script is the executed
# equivalent attempt for this sandbox. It is self-skipping and records
# exactly WHY it skipped, so a future environment that gains the missing
# pieces lights the test up with no code changes:
#
#   1. an S3 endpoint  — no `minio` binary ships in this container and
#      there is no egress to fetch one, BUT python3 `moto` (5.2.1) is
#      installed and `python3 -m moto.server` serves a functional
#      S3-compatible HTTP endpoint on :5000 — this half WORKS here;
#   2. the s3a client  — org.apache.hadoop.fs.s3a.S3AFileSystem needs
#      hadoop-aws + the AWS SDK bundle. Neither jar exists anywhere on
#      this filesystem (`find / -name 'hadoop-aws*.jar'` → nothing;
#      /opt/spark/jars has only hadoop-client-api/runtime), and zero
#      egress means they cannot be fetched. This half is IMPOSSIBLE in
#      this sandbox, so the test's second `assume` (classpath probe)
#      would skip even with the endpoint up.
#
# CLOSED ANOTHER WAY: graft.shelf.S3MiniFileSystem (a dependency-free
# S3-REST Hadoop FileSystem for unsigned dev endpoints) + the ShelfSpec
# test "store round-trips against a LIVE local S3 endpoint" now execute
# the Store round-trip against a moto endpoint over real HTTP in the
# normal `sbt test` run — only the s3a-specific pieces (SigV4 signing,
# multipart, SDK config) remain untested here, and those are what the
# recipe below lights up when the jars appear.
#
# Recipe (runs fully once hadoop-aws+SDK jars appear in /opt/spark/jars):
set -euo pipefail

AWS_JARS=$(ls /opt/spark/jars/hadoop-aws*.jar 2>/dev/null || true)
if [ -z "$AWS_JARS" ]; then
  echo "SKIP: no hadoop-aws jar in /opt/spark/jars — the s3a filesystem"
  echo "      class cannot load; the ShelfSpec S3 test would 'assume'-skip"
  echo "      on its classpath probe even with a live endpoint."
  echo "      (moto endpoint half verified separately: scripts/s3_local.sh --probe-endpoint)"
  if [ "${1:-}" != "--probe-endpoint" ]; then exit 0; fi
fi

# Start a local S3-compatible endpoint (moto server mode).
python3 -m moto.server -p 5001 >/tmp/moto.log 2>&1 &
MOTO_PID=$!
trap 'kill $MOTO_PID 2>/dev/null || true' EXIT
for i in $(seq 1 20); do
  curl -s http://localhost:5001/moto-api/ >/dev/null 2>&1 && break
  sleep 0.5
done

# Create the test bucket.
python3 - <<'EOF'
import boto3
s3 = boto3.client("s3", endpoint_url="http://localhost:5001",
                  aws_access_key_id="minioadmin",
                  aws_secret_access_key="minioadmin",
                  region_name="us-east-1")
s3.create_bucket(Bucket="graft-test")
# prove the endpoint actually stores and serves objects
s3.put_object(Bucket="graft-test", Key="probe", Body=b"graft-endpoint-ok")
assert s3.get_object(Bucket="graft-test", Key="probe")["Body"].read() \
    == b"graft-endpoint-ok"
print("endpoint probe: put/get round-trip OK on http://localhost:5001")
EOF

if [ -z "$AWS_JARS" ]; then
  echo "Endpoint half verified; client half still impossible (see above)."
  exit 0
fi

# Full run: point the env-skip test at the live endpoint.
GRAFT_S3_ENDPOINT=http://localhost:5001 \
GRAFT_S3_ACCESS_KEY=minioadmin GRAFT_S3_SECRET_KEY=minioadmin \
GRAFT_S3_BUCKET=graft-test \
  sbt --client 'testOnly graft.ShelfSpec -- -z "S3-compatible endpoint"'

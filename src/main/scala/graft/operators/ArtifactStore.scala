package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared machinery for MANIFEST-GATED artifact directories — ONE copy
  * of the persistence discipline the index/model families follow
  * ([[AnnArtifact]], [[Bm25]]'s index leg; [[TextModelSeam]] shares the
  * blob framing):
  *
  *   - DataFrame-scale state goes to parquet tables; small driver-side
  *     state goes to CRC32-framed binary blobs or manifest scalars;
  *   - the manifest is written LAST, so its existence certifies every
  *     table and blob landed (the Merge `_SUCCESS` discipline lifted to
  *     the whole artifact — a killed save never presents as an index);
  *   - loading verifies EVERYTHING by name before returning a frame:
  *     format + version (skew refused loudly, never silently misread),
  *     blob magic + CRC, per-table `_SUCCESS` commit markers, and exact
  *     nullability-relaxed schema equality (a renamed/retyped column
  *     fails at load, not as a null-joined empty probe).
  */
private[operators] object ArtifactStore {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.ObjectNode

  // ---- blob framing (magic + CRC32 + length + payload) ---------------

  def writeBlob(path: java.nio.file.Path, magic: Int,
                payload: Array[Byte]): Unit = {
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path)))
    try {
      out.writeInt(magic)
      out.writeLong(crc.getValue)
      out.writeInt(payload.length)
      out.write(payload)
    } finally out.close()
  }

  def readBlob(path: java.nio.file.Path, magic: Int,
               what: String): Array[Byte] = {
    val bytes = java.nio.file.Files.readAllBytes(path)
    require(bytes.length >= 16,
      s"$path is not a $what blob (${bytes.length} bytes, header needs 16)")
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val m = in.readInt()
    require(m == magic, f"$path is not a $what blob (magic 0x$m%08X)")
    val crcStored = in.readLong()
    val len = in.readInt()
    require(len == bytes.length - 16,
      s"$path: truncated or padded $what blob ($len declared, ${bytes.length - 16} present)")
    val payload = java.util.Arrays.copyOfRange(bytes, 16, bytes.length)
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    require(crc.getValue == crcStored,
      s"$path: $what CRC mismatch — refusing to serve from a corrupted index")
    payload
  }

  /** Schema for the manifest with nullability RELAXED everywhere: a
    * parquet round trip legally drops NOT NULL (the reader cannot prove
    * it), so comparing raw DDL would reject every freshly-written
    * artifact. Names and types are the skew the check exists for;
    * nullability is not.
    */
  def relaxedDdl(schema: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.types._
    def relax(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = relax(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(relax(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(relax(m.keyType), relax(m.valueType), valueContainsNull = true)
      case other => other
    }
    relax(schema).asInstanceOf[StructType].toDDL
  }

  /** Write `tables` as parquet under `dir`, then the manifest LAST.
    * `fill` adds format-specific scalar fields to the manifest node.
    */
  def commit(dir: String, format: String, version: Int,
             tables: Seq[(String, DataFrame)])
            (fill: ObjectNode => Unit): Unit = {
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(root)
    val om = new ObjectMapper()
    val node = om.createObjectNode()
    node.put("format", format)
    node.put("version", version)
    val tn = node.putObject("tables")
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name")
      tn.put(name, relaxedDdl(df.schema))
    }
    fill(node)
    java.nio.file.Files.write(root.resolve("MANIFEST.json"),
      om.writeValueAsBytes(node))
  }

  /** Parse + gate the manifest: existence, format name, exact version.
    * `what` names the artifact family in the failure messages.
    */
  def manifest(dir: String, format: String, version: Int,
               what: String): JsonNode = {
    val mPath = java.nio.file.Paths.get(dir).resolve("MANIFEST.json")
    require(java.nio.file.Files.exists(mPath),
      s"$dir has no MANIFEST.json — not a persisted $what (or its save never completed)")
    val om = new ObjectMapper()
    val m = om.readTree(java.nio.file.Files.readAllBytes(mPath))
    require(m.path("format").asText() == format,
      s"$dir/MANIFEST.json: format '${m.path("format").asText()}' is not $format")
    val v = m.path("version").asInt(-1)
    require(v == version,
      s"$dir: $what format version $v, this reader is version $version — " +
        "rebuild the artifact or upgrade the reader (refusing a skewed read)")
    m
  }

  /** Load a manifest-listed table: `_SUCCESS` commit marker + exact
    * (nullability-relaxed) schema equality, or None if the manifest
    * does not list it.
    */
  def table(spark: SparkSession, dir: String, m: JsonNode,
            name: String): Option[DataFrame] = {
    val node = m.path("tables").path(name)
    if (node.isMissingNode) None
    else {
      require(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, name, "_SUCCESS")),
        s"$dir/$name: no _SUCCESS marker — the table write never committed")
      val df = spark.read.parquet(s"$dir/$name")
      require(relaxedDdl(df.schema) == node.asText(),
        s"$dir/$name: schema '${relaxedDdl(df.schema)}' does not match the " +
          s"manifest's '${node.asText()}' — a skewed or overwritten table")
      Some(df)
    }
  }
}

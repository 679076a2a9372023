package graft

import org.apache.spark.sql.functions._

/** Reproducible scale-stress scenarios behind BASELINE.md's stress lines.
  * Each scenario replicates the sf0.1 test data in /tmp and times the
  * production operator code (never a copy of it) at 100×–500× the bench
  * scale. Usage: `runMain graft.Stress <scenario>` with one of:
  *
  *  - `ivf_centroids` — 1M-vector IVF centroid build (ops.Similarity
  *    .ivfCentroids, the posexplode elementwise-mean path)
  *  - `q1_100x` — 60M-row q1Agg with the partition-local-long →
  *    decimal(38,0)-merge overflow-safe aggregation
  *  - `q1_warm` — warm A/B of that aggregation vs raw single-level long
  *    sums on the table `q1_100x` wrote
  *  - `lsh_dedup_100x` — 200k-vector dedupEmbeddingLsh end-to-end
  *    (8-table candidates + exact verify)
  *  - `skew_100x` — 10M-row join with 90% of rows on one hot key:
  *    AQE skew-join vs 16-way salt vs naive
  *  - `cc_incremental` — 50k-edge batch merged into a 1.1M-vertex
  *    labelling vs full recompute (asserts bit-identical output)
  *  - `spans_10x` — 50k-doc dedup_spans where every window is duplicated
  *    (worst-case mark-back fan-out)
  *  - `search_10x` — 50k-doc bm25_search + inverted_index (31-term vocab
  *    ⇒ maximal per-term posting skew)
  *  - `incdedup_10x` — 500k-doc snapshot + 50k incoming batch:
  *    bitmap-prefilter incremental dedup vs full re-dedup A/B
  *  - `topk_10x` — 10M-row top-3-per-group with 90% of rows on one hot
  *    key: bounded TopKAggregate vs window row_number A/B (same output)
  *  - `bpe_10x` — 50k-doc BPE induction: corpus stage ×10, merge steps
  *    vocab-bound; asserts learned merges are replication-invariant
  *  - `dsir_10x` — 50k-doc dsir_weights / doc_chunk / source_reputation
  *    (10× bench corpus: 10× bucket counts, 10× chunk fan-out, 10×
  *    dup density for the reputation window)
  *  - `scd2_10x` — 10M-event SCD2 build: fused one-exchange form vs
  *    naive per-stage repartition A/B (same output checksum)
  *  - `quantile_10x` — 6M-row lineitem: histogram exact quantiles vs
  *    sort-based percentile() A/B (same output checksum)
  *  - `bloom_decon_10x` — 50k-doc decontamination: exact eval-shingle
  *    broadcast vs bloom prefilter A/B (same output checksum) + the
  *    broadcast-size / prefilter-selectivity accounting
  *  - `rolling_10x` — 1M-event rolling 7-day distinct: day-dedup-first
  *    vs raw-event explode, shuffle-record A/B (same output checksum)
  *  - `fk_elim_10x` — 6M-row BI-view join: B38 rule ON (join deleted)
  *    vs OFF (real shuffle join), checksum-asserted identical
  *  - `agg_ceiling` — run under SPARK_DRIVER_MEM=2g: the three
  *    TypedImperativeAggregates (RoaringBitmap distinct, TopK heap,
  *    Misra-Gries) over 50M 90%-hot-key rows inside a deliberately
  *    constrained heap, with heap-pool peaks and bitmap state size
  *    reported — the O(k)/O(compressed-set) buffer claims measured
  *    under pressure
  *  - `source_6m` — the graft-snapshot data source at 6M rows / 64
  *    files: plan-time zone-map slab pruning + bloom point lookup
  *    through `spark.read.format`, opened-file fractions, planning
  *    latency and full-scan A/B
  *  - `catalog_6m` — A34's row-level SQL at 6M rows / 64 files:
  *    zone-mapped UPDATE rewrites 1 file (1.6% of bytes) with 63
  *    carried byte-identical vs the stats-less full-table rewrite A/B;
  *    surgical DELETE locality; conservation + time-travel gates
  *  - `skew_write` — 12M-row identity-partitioned write with 80% of
  *    rows on one partition value: the rebalance-planned clustered
  *    write (AQE skew-splits the hot value) vs the
  *    'writedistribution'='none' V1 partitionBy leg, wall-clock and
  *    file-count A/B with identical-answer gates
  *  - `stream_backlog_12m` — the DSv2 streaming pipe draining a 12M-row
  *    8-commit backlog: unpaced (one all-or-nothing epoch) vs
  *    maxbytespertrigger-paced AvailableNow epochs, per-window byte
  *    caps, exactly-once and wall-clock parity gated
  *  - `curation_1000x` — the E7/E13 whole-pipeline soak at 5M docs
  *    (1000× sf0.1): fused projection + checkpoint staging + hash
  *    window + shingle broadcast competing for memory at once, with
  *    task CPU, shuffle, spill and heap peaks recorded per leg
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("graft-stress")
    val sf = "/root/testdata/sf0.1"

    def timed[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label: $r in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    args.headOption.getOrElse("ivf_centroids") match {
      case "ivf_centroids" =>
        // 2k base vectors × 500 copies = 1M vectors, ids kept distinct;
        // labels unchanged so cluster populations scale 500× (the exact
        // skew shape that killed the old collect_list build)
        val big = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
          .crossJoin(spark.range(500).select(col("id").as("rep")))
          .select((col("vec_id") * 500 + col("rep")).as("vec_id"), col("embedding"), col("label"))
        big.repartition(32).write.mode("overwrite").parquet("/tmp/stress_emb/embeddings.parquet")
        val e = spark.read.parquet("/tmp/stress_emb/embeddings.parquet")
          .select(col("label"), ops.Similarity.quantize(col("embedding")).as("qv"))
        timed("ivf_centroids 1M vectors")(ops.Similarity.ivfCentroids(e).count())

      case "q1_100x" =>
        val big = Tables.lineitem(spark, sf)
          .crossJoin(spark.range(100).select(col("id").as("rep"))).drop("rep")
        // repartition before writing: the crossJoin replica otherwise lands
        // in ONE parquet row group (great RLE, zero scan parallelism)
        big.repartition(32).write.mode("overwrite").parquet("/tmp/stress_li/lineitem.parquet")
        timed("q1_agg 60M rows")(
          relational.Relational.q1Agg(spark, "/tmp/stress_li")
            .write.mode("overwrite").format("noop").save())

      case "lsh_dedup_100x" =>
        // 100× vectors with per-copy jitter on one coordinate so copies are
        // near-dups (cos ≈ 1) of their seed — a dense-group stress for the
        // bucketed candidate path. numPlanes scales with the corpus
        // (2^14 buckets/table for 200k vectors ⇒ ~12 vectors/bucket);
        // keeping the bench default of 6 planes here would put ~3k vectors
        // in every bucket and the per-bucket quadratic join blows up —
        // that scaling rule is the operator's documented contract.
        val big = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
          .crossJoin(spark.range(100).select(col("id").as("rep")))
          .select((col("vec_id") * 100 + col("rep")).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x + col("rep").cast("float") / lit(1e4f)).otherwise(x))
              .as("embedding"),
            col("label"))
        big.repartition(32).write.mode("overwrite").parquet("/tmp/stress_emb2/embeddings.parquet")
        timed("dedup_embedding_lsh 200k vectors (14 planes/table)")(
          ops.Similarity.dedupEmbeddingLsh(spark, "/tmp/stress_emb2", numPlanes = 14).count())

      case "skew_100x" =>
        // 10M-row fact with 90% of rows on ONE hot key, grouped after a
        // join against a 150k-row dim. Three plans over the same data:
        // AQE skew-split (GraftSession default), explicit 16-way salt
        // (ops.Skew.saltedJoin), and the naive join with AQE skew
        // handling OFF — the §4 pathological-skew story, measured.
        val dim = Tables.customer(spark, sf).select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        val hot = dim.agg(min("user_id")).head().getLong(0)
        val fact = spark.range(10000000).select(
          when(col("id") % 10 < 9, lit(hot)).otherwise(col("id") % 150000).as("user_id"),
          (col("id") % 1000).cast("double").as("value"))
        fact.repartition(32).write.mode("overwrite").parquet("/tmp/stress_skew/fact.parquet")
        val f = spark.read.parquet("/tmp/stress_skew/fact.parquet")
        def agg(j: org.apache.spark.sql.DataFrame) =
          j.groupBy("c_mktsegment").agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,4)")).as("sv"))
        // disable broadcast so the join actually shuffles (dim is tiny here;
        // at real scale the dim side is too big to broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        timed("skew 10M/90%-hot AQE skew-join")(
          agg(f.join(dim, "user_id")).write.mode("overwrite").format("noop").save())
        timed("skew 10M/90%-hot 16-way salted")(
          agg(ops.Skew.saltedJoin(f, dim, "user_id")).write.mode("overwrite").format("noop").save())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timed("skew 10M/90%-hot naive (AQE skew OFF)")(
          agg(f.join(dim, "user_id")).write.mode("overwrite").format("noop").save())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

      case "spans_10x" =>
        // 50k docs (10 copies of sf0.1, distinct ids): EVERY window hash
        // now occurs in ≥2 docs, so the mark-back join matches every
        // window and each doc merges into one maximal span — the
        // worst-case output shape (boilerplate-heavy corpora look like
        // this). Stresses window hashing (2.1M md5s), the min/max-doc_id
        // hash agg, the full-fanout mark-back join and the island merge.
        val big = Tables.documents(spark, sf).select("doc_id", "text")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"), col("text"))
        big.repartition(32).write.mode("overwrite").parquet("/tmp/stress_docs/documents.parquet")
        timed("dedup_spans 50k docs, all-duplicated worst case")(
          ops.Dedup.spans(spark, "/tmp/stress_docs").count())

      case "search_10x" =>
        // 50k docs (10× sf0.1, distinct ids): every vocabulary term's
        // posting list is ~50k entries (31-term vocab ⇒ maximal per-term
        // skew — each inverted_index window partition is the whole
        // corpus's postings for that term), and bm25's filtered explode
        // emits ~matches-only rows. Times both halves of the search pair.
        val big = Tables.documents(spark, sf).select("doc_id", "text")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"), col("text"))
        big.repartition(32).write.mode("overwrite").parquet("/tmp/stress_srch/documents.parquet")
        // cold + warm: the first run absorbs session codegen/broadcast
        // startup (same reason Bench warms up before timing)
        timed("bm25_search 50k docs (cold)")(
          ops.Search.bm25(spark, "/tmp/stress_srch").count())
        timed("bm25_search 50k docs (warm)")(
          ops.Search.bm25(spark, "/tmp/stress_srch").count())
        timed("inverted_index 50k docs")(
          ops.Search.invertedIndex(spark, "/tmp/stress_srch").count())

      case "incdedup_10x" =>
        // 50k-doc "existing corpus" (10× sf0.1, distinct ids ≡ 1..4 mod 5)
        // + 5k incoming batch (ids ≡ 0 mod 5, every 10th a byte-identical
        // copy of an old doc). A/B (warm, cold shown for context): the D27
        // bitmap-prefilter path vs re-running full dedup_exact over
        // old ∪ incoming. The win to watch is SHUFFLE VOLUME: the naive
        // window re-shuffles every doc's hash each refresh, the
        // incremental path shuffles only tiny bitmap partials + the
        // candidate set (old corpus scanned map-side only).
        val old10 = Tables.documents(spark, sf).select("doc_id", "text")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 50 + col("rep") * 5 + 1).as("doc_id"), col("text"))
        val incoming = Tables.documents(spark, sf).select("doc_id", "text")
          .select((col("doc_id") * 10).as("doc_id"),
            when(col("doc_id") % 10 === 0, col("text"))
              .otherwise(concat(col("text"), lit(" novel tail "), col("doc_id"))).as("text"))
        old10.unionByName(incoming).repartition(32)
          .write.mode("overwrite").parquet("/tmp/stress_inc/documents.parquet")
        // shuffle-volume accounting: THE structural contract — at a real
        // snapshot scale the naive window re-shuffles the whole corpus's
        // hashes every refresh while the incremental path's shuffle is
        // bitmap partials + candidates, independent of old-corpus size
        val shuffled = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (t.taskMetrics != null)
                shuffled.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          })
        def shuffleOf(label: String)(f: => Long): Unit = {
          Thread.sleep(1000); shuffled.set(0L)
          timed(label)(f)
          Thread.sleep(1000) // listener bus drain
          println(f"[stress] $label shuffle-write: ${shuffled.get / 1024.0}%.0f KiB")
        }
        timed("dedup_incremental 50k old + 5k incoming (cold)")(
          ops.Dedup.incremental(spark, "/tmp/stress_inc")
            .filter(col("is_dup")).count())
        shuffleOf("dedup_incremental 50k old + 5k incoming (warm)")(
          ops.Dedup.incremental(spark, "/tmp/stress_inc")
            .filter(col("is_dup")).count())
        shuffleOf("full dedup_exact over the same 55k (warm)")(
          ops.Dedup.exact(spark, "/tmp/stress_inc").filter(col("is_dup")).count())

      case "cc_incremental" =>
        // 1.1M-vertex base graph (100k chains of 10 + a 100k-vertex star),
        // then a 50k-edge increment linking chains pairwise. The merge
        // must be bit-identical to a full recompute and much cheaper.
        val chains = spark.range(100000)
          .select(col("id"), explode(sequence(lit(0L), lit(8L))).as("i"))
          .select((col("id") * 10 + col("i")).as("a"), (col("id") * 10 + col("i") + 1).as("b"))
        val star = spark.range(100000)
          .select(lit(2000000L).as("a"), (col("id") + 2000001L).as("b"))
        val base = chains.union(star)
        val inc = spark.range(50000)
          .select((col("id") * 20).as("a"), (col("id") * 20 + 10).as("b"))
        val lab0 = ops.Clustering.connectedComponents(base)
        var full: org.apache.spark.sql.DataFrame = null
        timed("cc full recompute 1.15M edges")(
          { full = ops.Clustering.connectedComponents(base.union(inc)); full.count() })
        var incr: org.apache.spark.sql.DataFrame = null
        timed("cc incremental 50k-edge merge")(
          { incr = ops.Clustering.incrementalComponents(lab0, inc); incr.count() })
        val diff = incr.exceptAll(full).count() + full.exceptAll(incr).count()
        println(s"[stress] incremental == full recompute: ${diff == 0} (diff rows: $diff)")

      case "dsir_10x" =>
        // 50k docs with distinct ids but 10×-replicated text: every
        // bigram bucket count scales 10× (dist stays 1024 rows — the
        // broadcast is corpus-size-independent, which is the claim),
        // doc_chunk fans out ~10× chunks, and every source's dup rate
        // hits 100% (worst case for the reputation hash window).
        val big = Tables.documents(spark, sf)
          .select("doc_id", "lang", "text", "source", "n_chars")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
            col("lang"), col("text"), col("source"), col("n_chars"))
        big.repartition(32).write.mode("overwrite")
          .parquet("/tmp/stress_dsir/documents.parquet")
        timed("dsir_weights 50k docs (cold)")(
          ops.TextAnalysis.dsirWeights(spark, "/tmp/stress_dsir").count())
        timed("dsir_weights 50k docs (warm)")(
          ops.TextAnalysis.dsirWeights(spark, "/tmp/stress_dsir").count())
        timed("doc_chunk 50k docs")(
          ops.TextAnalysis.docChunk(spark, "/tmp/stress_dsir").count())
        timed("source_reputation 50k docs")(
          ops.Curate.sourceReputation(spark, "/tmp/stress_dsir").count())
        // graph_rank at 10×: every length-band bucket is 10× denser, so
        // the capped candidate graph hits its star-degrade regime — the
        // worst case for the 3 iteration joins
        timed("graph_rank 50k docs")(
          ops.Clustering.graphRank(spark, "/tmp/stress_dsir").count())
        // heavy_hitters vs vocab_topk shuffle A/B — on a LARGE vocabulary
        // (the bench corpus has 31 words, which hides the claim): 50k
        // docs × (1 hot + 40 globally-unique tokens) ⇒ 2M distinct. The
        // full groupBy must shuffle a (token, count) partial per distinct
        // token per partition; the sketch path shuffles 64-entry map
        // partials + the candidate-filtered recount, vocab-independent.
        // "hot" twice per doc → share 2/42 ≈ 4.8% > the 1/32 threshold
        spark.range(50000).select(col("id").as("doc_id"),
          concat_ws(" ", lit("hot hot"),
            concat_ws(" ", transform(sequence(lit(0), lit(39)),
              j => concat(lit("t"), col("id") * 40 + j)))).as("text"))
          .repartition(32)
          .write.mode("overwrite").parquet("/tmp/stress_hh/documents.parquet")
        val shuffled = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (t.taskMetrics != null)
                shuffled.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          })
        def shuffleOf(label: String)(f: => Long): Unit = {
          Thread.sleep(1000); shuffled.set(0L)
          timed(label)(f)
          Thread.sleep(1000) // listener bus drain
          println(f"[stress] $label shuffle-write: ${shuffled.get / 1024.0}%.0f KiB")
        }
        shuffleOf("heavy_hitters 2M-distinct vocab (warm)")(
          ops.Curate.heavyHitters(spark, "/tmp/stress_hh").count())
        shuffleOf("vocab_topk 2M-distinct vocab (warm)")(
          ops.Curate.vocabTopk(spark, "/tmp/stress_hh").count())

      case "asof_10x" =>
        // 100k events / 150k orders (10× sf0.1): A/B the composed
        // union-window B13 against the native merge-scan exec (B13b).
        // The composed form unions BOTH relations and drags every column
        // through one running-last window; the native exec shuffles each
        // side once on the key and merge-scans per co-partition.
        val ev10 = Tables.events(spark, sf)
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("event_id") * 10 + col("rep")).as("event_id"), col("ts"),
            col("user_id"), col("event_type"), col("value"), col("props"))
        val or10 = Tables.orders(spark, sf)
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("o_orderkey") * 10 + col("rep")).as("o_orderkey"),
            col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderdate"), col("o_orderpriority"))
        ev10.repartition(32).write.mode("overwrite").parquet("/tmp/stress_asof/events.parquet")
        or10.repartition(32).write.mode("overwrite").parquet("/tmp/stress_asof/orders.parquet")
        // A/B methodology: consume EVERY output column via sum(xxhash64(*)).
        // A bare .count() is a degenerate benchmark for the COMPOSED form:
        // ColumnPruning drops the unused window (no matched_* consumer) and
        // the filter event_id IS NOT NULL folds the orders branch of the
        // union to empty - the "composed join" collapses to a count of the
        // events scan (measured: 16 shuffle records). The native node is
        // not prunable that way (Catalyst cannot know it preserves left
        // cardinality), so count() compares a real join against a no-op.
        def consume(df: org.apache.spark.sql.DataFrame): Long = {
          df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
            .collect()(0).getDecimal(0).longValue()
        }
        // min of 5 warm runs: single-run times at this scale carry
        // +-0.3 s of JIT/scheduling noise
        def best(label: String)(f: => Long): Unit = {
          f // cold
          val times = (1 to 5).map { _ =>
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          println(f"[stress] $label: min ${times.min}%.2f s of ${times.map(t => f"$t%.2f").mkString("/")}")
        }
        val h1 = consume(relational.Relational.asofJoin(spark, "/tmp/stress_asof"))
        val h2 = consume(relational.Relational.asofJoinNative(spark, "/tmp/stress_asof"))
        require(h1 == h2, s"asof A/B checksum mismatch: composed=$h1 native=$h2")
        println(s"[stress] asof A/B output checksums agree: $h1")
        best("asof composed full-consume (warm x5)")(
          consume(relational.Relational.asofJoin(spark, "/tmp/stress_asof")))
        best("asof native exec full-consume (warm x5)")(
          consume(relational.Relational.asofJoinNative(spark, "/tmp/stress_asof")))
        // third implementation of the same relation: the C15 stateful
        // machine in batch mode (flatMapGroupsWithState, per-key merge in
        // executor memory — state the size of one key's traffic)
        val h3 = consume(streaming.Streams.asofStatefulQuery(spark, "/tmp/stress_asof"))
        require(h3 == h1, s"asof stateful checksum mismatch: $h3 vs $h1")
        best("asof C15 stateful full-consume (warm x5)")(
          consume(streaming.Streams.asofStatefulQuery(spark, "/tmp/stress_asof")))
        // the structural case: both sides BUCKETED on the key. The native
        // exec's distribution requirement is satisfied by the bucketed
        // scan → zero exchanges; the composed form's union discards the
        // bucketing and reshuffles everything, every run.
        val evB = Tables.events(spark, "/tmp/stress_asof").select(
          col("user_id").as("k"), unix_micros(col("ts")).as("t"),
          col("event_id"), col("ts"))
        val orB = Tables.orders(spark, "/tmp/stress_asof").select(
          col("o_custkey").as("rk"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("rt"),
          col("o_orderkey"),
          col("o_totalprice").cast("decimal(12,2)").as("o_total"))
        // a prior run's warehouse location survives the in-memory catalog —
        // drop table AND location or saveAsTable hits LOCATION_ALREADY_EXISTS
        relational.Bucketing.reset(spark, "graft_stress_asof_ev")
        relational.Bucketing.reset(spark, "graft_stress_asof_or")
        relational.Bucketing.writeBucketed(evB, "graft_stress_asof_ev", "k")
        relational.Bucketing.writeBucketed(orB, "graft_stress_asof_or", "rk")
        def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
          df.count()
          "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
        }
        val nat = relational.Relational.asofJoinNativeOn(spark,
          spark.table("graft_stress_asof_ev"), spark.table("graft_stress_asof_or"))
        nat.count() // warm
        best("asof native over bucketed tables full-consume (warm x5)")(consume(nat))
        println(s"[stress] native-over-bucketed exchanges (excl. output sort): " +
          (exchanges(nat) - 1)) // the final orderBy's rangepartitioning is shared by both forms

      case "curate_fused" =>
        // A/B for the r9 fusion. Two cost observables per query, same data:
        //  - summed task run time (the cluster-CPU multiplier at 100 TB)
        //  - wall time (local[CPUS])
        // Output is consumed via sum(xxhash64(*)) — count() is degenerate
        // here too (quality_vote's surprisal left join has unique right
        // keys and no consumed columns, so count() ELIMINATES the join).
        // "Unfused" = the identical query shape minus the localCheckpoint
        // staging (pipeline/funnel: base re-executes per subtree, the r8
        // form), and for quality_vote the r8 join-of-four-unit-queries.
        // 50k docs (10× sf0.1, distinct ids; doc_id*10+rep keeps the %23
        // eval split distributed) — big enough that JIT and fixed per-job
        // overheads stop dominating the A/B
        val docs10 = Tables.documents(spark, sf)
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select(((col("doc_id") * 10 + col("rep")).as("doc_id") +:
            Tables.documents(spark, sf).columns.filter(_ != "doc_id").map(col)): _*)
        docs10.repartition(32).write.mode("overwrite")
          .parquet("/tmp/stress_curate/documents.parquet")
        val cd = "/tmp/stress_curate"
        val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null) taskMs.addAndGet(te.taskMetrics.executorRunTime)
          })
        def consume(df: org.apache.spark.sql.DataFrame): Long =
          df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
            .collect()(0).getDecimal(0).longValue()
        def abRun(label: String)(f: => Long): Long = {
          val check = f // warm
          val (walls, tasks) = (1 to 3).map { _ =>
            Thread.sleep(500); taskMs.set(0)
            val t0 = System.nanoTime(); f
            val wall = (System.nanoTime() - t0) / 1e9
            Thread.sleep(500)
            (wall, taskMs.get / 1000.0)
          }.unzip
          println(f"[stress] $label: wall min ${walls.min}%.2f s, " +
            f"task-time min ${tasks.min}%.2f s of ${tasks.map(t => f"$t%.2f").mkString("/")}")
          check
        }
        val p1 = abRun("curate_pipeline FUSED (staged base)")(
          consume(ops.Curate.pipelineStaged(spark, cd, stage = true)))
        val p0 = abRun("curate_pipeline UNFUSED (base x3)")(
          consume(ops.Curate.pipelineStaged(spark, cd, stage = false)))
        require(p0 == p1, s"pipeline A/B checksum mismatch: $p0 vs $p1")
        val f1 = abRun("curation_funnel FUSED (staged base)")(
          consume(ops.Curate.curationFunnelStaged(spark, cd, stage = true)))
        val f0 = abRun("curation_funnel UNFUSED (base x3)")(
          consume(ops.Curate.curationFunnelStaged(spark, cd, stage = false)))
        require(f0 == f1, s"funnel A/B checksum mismatch: $f0 vs $f1")
        // r8 quality_vote shape: join of the four oracled unit queries
        def voteUnfused(): org.apache.spark.sql.DataFrame = {
          val g = ops.TextAnalysis.gopherFilter(spark, cd)
            .select(col("doc_id"), col("keep").as("v_gopher"))
          val r = ops.TextAnalysis.repetitionScore(spark, cd)
            .select(col("doc_id"), (col("dup3_x1000") <= 300).as("v_rep"))
          val c = ops.TextAnalysis.classifierScore(spark, cd)
            .select(col("doc_id"), col("keep").as("v_clf"))
          val u = ops.TextAnalysis.unigramSurprisal(spark, cd)
            .select(col("doc_id"), col("bits_per_tok_x1000").between(1000, 8000).as("v_surp"))
          g.join(r, "doc_id").join(c, "doc_id").join(u, Seq("doc_id"), "left")
            .withColumn("v_surp", coalesce(col("v_surp"), lit(false)))
            .withColumn("votes",
              (col("v_gopher").cast("int") + col("v_rep").cast("int") +
                col("v_clf").cast("int") + col("v_surp").cast("int")).cast("long"))
            .withColumn("keep", col("votes") >= 3)
            .select("doc_id", "v_gopher", "v_rep", "v_clf", "v_surp", "votes", "keep")
            .orderBy("doc_id")
        }
        val v1 = abRun("quality_vote FUSED (one projection + surprisal join)")(
          consume(ops.Curate.qualityVote(spark, cd)))
        val v0 = abRun("quality_vote UNFUSED (r8 four-query join)")(
          consume(voteUnfused()))
        require(v0 == v1, s"vote A/B checksum mismatch: $v0 vs $v1")

      case "dedup_bucketed" =>
        // 50k docs: the B19 layout discipline applied to D1 — shuffle bytes
        // of the window dedup over a flat corpus vs the same corpus written
        // bucketed+sorted on the content hash. Output consumed via
        // sum(xxhash64(*)) (count() would prune the window) and checksums
        // asserted equal between layouts.
        val d10 = Tables.documents(spark, sf)
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select(((col("doc_id") * 10 + col("rep")).as("doc_id")) +:
            Tables.documents(spark, sf).columns.filter(_ != "doc_id").map(col): _*)
        d10.repartition(32).write.mode("overwrite")
          .parquet("/tmp/stress_dedupb/documents.parquet")
        val shufB = new java.util.concurrent.atomic.AtomicLong(0)
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null)
                shufB.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          })
        def consumeHash(df: org.apache.spark.sql.DataFrame): Long =
          df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
            .collect()(0).getDecimal(0).longValue()
        def shufOf(label: String)(f: => Long): Long = {
          val check = f // warm
          Thread.sleep(1000); shufB.set(0)
          val t0 = System.nanoTime(); f
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000)
          println(f"[stress] $label: shuffle-write ${shufB.get / 1024.0}%.0f KiB, wall $wall%.2f s")
          check
        }
        val cFlat = shufOf("dedup_exact 50k flat corpus")(
          consumeHash(ops.Dedup.exact(spark, "/tmp/stress_dedupb")))
        // bucketed layout staged once (the recurring-refresh warehouse
        // state); the measured query is the dedup over the standing table
        relational.Bucketing.reset(spark, "graft_stress_docs_h")
        relational.Bucketing.writeBucketed(
          Tables.documents(spark, "/tmp/stress_dedupb").select(col("doc_id"),
            md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h")),
          "graft_stress_docs_h", "h")
        val cBuck = shufOf("dedup_exact 50k bucketed-on-hash corpus")(
          consumeHash(ops.Dedup.exactOn(spark.table("graft_stress_docs_h"))))
        require(cFlat == cBuck, s"layout A/B checksum mismatch: $cFlat vs $cBuck")
        println(s"[stress] layout A/B checksums agree: $cFlat")

      case "graph_star" =>
        // 100k docs that all land in ONE (lang, length-band) bucket — the
        // adversarial regime for candidate generation: cappedPairs (cap 64,
        // the documented knob on bandedCandidates/candidatePairs) degrades
        // the bucket to a first-id star, so the edge list is O(n) with a
        // single max-degree hub instead of O(n²). graph_rank's iteration
        // joins then face that hub: contributions INTO it are one hot
        // groupBy key (map-side partial agg absorbs it), and its
        // outbound r DIV deg stays integer-exact — 85·in_sum peaks at
        // ~10^11 here, 6 orders below the 2^63 bound.
        val starDocs = spark.range(100000).select(
          col("id").as("doc_id"), lit("en").as("lang"), lit(4096L).as("n_chars"))
        val starEdges = ops.Dedup.bandedCandidates(starDocs).localCheckpoint()
        timed("star candidate edges (expect n-1, not n^2/2)")(starEdges.count())
        timed("graph_rank over the 100k-vertex star")(
          ops.Clustering.graphRankOn(starEdges).count())
        // sanity: the hub really is max-degree and ranks stay in range
        val ranked = ops.Clustering.graphRankOn(starEdges)
        val hub = ranked.orderBy(col("deg").desc).head()
        println(s"[stress] hub degree ${hub.getLong(1)}, hub rank_x1e6 ${hub.getLong(2)}")

      case "topk_10x" =>
        // 10M rows, 90% on ONE key. Spark 4 partial-WindowGroupLimits the
        // window form before the exchange, so shuffle volume ties; the A/B
        // isolates what remains — the window path's two full sorts vs the
        // aggregate's streaming heap. Both forms must agree exactly.
        import org.apache.spark.sql.expressions.Window
        val rows = spark.range(10000000).select(
          when(col("id") % 10 === 0, col("id") % 1000).otherwise(lit(-1L)).as("g"),
          ((col("id") * 2654435761L) % 1000000007L).as("price"),
          col("id").as("pid"))
        rows.write.mode("overwrite").parquet("/tmp/stress_topk")
        val t = spark.read.parquet("/tmp/stress_topk")
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "topk_pairs_3",
          es => functions.TopKAggregate(es(0), es(1), 3).toAggregateExpression(),
          "built-in")
        def viaAgg() = t.groupBy("g")
          .agg(call_function("topk_pairs_3", col("price"), col("pid")).as("top"))
          .select(col("g"), posexplode(col("top")))
          .select(col("g"), (col("pos") + 1).as("rnk"), col("col.payload").as("pid"),
            col("col.sort_key").as("price"))
        def viaWindow() = {
          val w = Window.partitionBy("g").orderBy(col("price").desc, col("pid"))
          t.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
            .select("g", "rnk", "pid", "price")
        }
        def checksum(df: org.apache.spark.sql.DataFrame): Long =
          df.select(expr("bit_xor(xxhash64(g, rnk, pid, price))"))
            .head().getLong(0)
        val shuffled = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null)
                shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          })
        var ca = 0L; var cw = 0L
        def shuffleOf(label: String)(f: => Long): Unit = {
          Thread.sleep(1000); shuffled.set(0L)
          timed(label)(f)
          Thread.sleep(1000) // listener bus drain
          println(f"[stress] $label shuffle-write: ${shuffled.get / 1024.0}%.0f KiB")
        }
        shuffleOf("topk via bounded aggregate (hot key 9M rows)") { ca = checksum(viaAgg()); ca }
        shuffleOf("topk via window row_number (hot key 9M rows)") { cw = checksum(viaWindow()); cw }
        assert(ca == cw, s"forms disagree: $ca vs $cw")

      case "bpe_10x" =>
        // 10× document replication (50k docs): the corpus-sized stage
        // (word count) grows 10×, but every merge step operates on the
        // UNCHANGED vocabulary — wall time must grow far less than 10×,
        // and the learned merges must be bit-identical (frequencies scale
        // uniformly, so every argmax and tie-break is preserved).
        val docs10 = Tables.documents(spark, sf)
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select((col("doc_id") * 10 + col("rep")).as("doc_id"), col("text"),
            col("lang"), col("source"), col("n_chars"))
        docs10.repartition(32).write.mode("overwrite")
          .parquet("/tmp/stress_bpe/documents.parquet")
        var m1x: Array[(Int, String, String)] = null
        var m10x: Array[(Int, String, String)] = null
        timed("bpe_train 1x (5k docs)") {
          m1x = ops.Tokenize.bpeTrain(spark, sf).collect()
            .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
          m1x.length
        }
        timed("bpe_train 10x (50k docs)") {
          m10x = ops.Tokenize.bpeTrain(spark, "/tmp/stress_bpe").collect()
            .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
          m10x.length
        }
        assert(m1x.sameElements(m10x),
          s"replication changed the learned merges: ${m1x.mkString(";")} vs ${m10x.mkString(";")}")
        timed("bpe_encode 10x (50k docs)")(
          ops.Tokenize.bpeEncode(spark, "/tmp/stress_bpe").count())

      case "scd2_10x" =>
        // 10M-event change log over 100k entities (100 events each, ~5
        // attribute states): the fused A22 build (ONE exchange — both
        // windows and the aggregate reuse the user_id partitioning) vs
        // the naive form that repartitions between steps, as a separate
        // shuffle per stage. Checksums must agree; the delta is pure
        // exchange-reuse.
        import org.apache.spark.sql.expressions.Window
        spark.range(10000000).select(
            (col("id") % 100000).as("user_id"),
            col("id").as("event_id"),
            concat(lit("t"), ((col("id") * 2654435761L) % 5).cast("string")).as("event_type"),
            expr("timestamp_micros((id DIV 100000) * 60000000 + id % 100000)").as("ts"),
            lit(0.0).as("value"), lit("{}").as("props"))
          .write.mode("overwrite").parquet("/tmp/stress_scd2/events.parquet")
        def naive() = {
          val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
          val byVersion = Window.partitionBy("user_id").orderBy("version")
          val prev = lag("event_type", 1).over(byUser)
          Tables.events(spark, "/tmp/stress_scd2")
            .select(col("user_id"), col("event_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
            .withColumn("chg", when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
            .withColumn("version",
              sum("chg").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .repartition(col("user_id"), col("version")) // the shuffle a naive build pays
            .groupBy("user_id", "version")
            .agg(min("event_type").as("event_type"),
              expr("min(us) DIV 1000000").as("valid_from_sec"),
              count(lit(1)).as("n_events"))
            .repartition(col("user_id")) // and another before the close
            .withColumn("valid_to_sec", lead("valid_from_sec", 1).over(byVersion))
            .withColumn("is_current", col("valid_to_sec").isNull)
            .select("user_id", "version", "event_type", "valid_from_sec",
              "valid_to_sec", "is_current", "n_events")
        }
        def checksum(df: org.apache.spark.sql.DataFrame): Long =
          df.select(expr("bit_xor(xxhash64(user_id, version, event_type, " +
            "valid_from_sec, coalesce(valid_to_sec, -1), n_events))"))
            .head().getLong(0)
        val shuffled = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null)
                shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          })
        var cf = 0L; var cn = 0L
        def shuffleOf(label: String)(f: => Long): Unit = {
          Thread.sleep(1000); shuffled.set(0L)
          timed(label)(f)
          Thread.sleep(1000)
          println(f"[stress] $label shuffle-write: ${shuffled.get / 1048576.0}%.1f MiB")
        }
        // untimed warmup: JVM/codegen + page cache belong to the session,
        // not the form measured first (the Bench discipline; without it
        // the first form reads 2-3 s slower and the A/B inverts)
        checksum(etl.Scd.scd2History(spark, "/tmp/stress_scd2"))
        checksum(naive())
        shuffleOf("scd2 fused one-exchange build (10M events)") {
          cf = checksum(etl.Scd.scd2History(spark, "/tmp/stress_scd2")); cf }
        shuffleOf("scd2 naive per-stage repartition build (10M events)") {
          cn = checksum(naive()); cn }
        assert(cf == cn, s"forms disagree: $cf vs $cn")

      case "quantile_10x" =>
        // 6M-row lineitem (10× sf0.1): B17's sort-based percentile() vs
        // B17b's value-histogram form on identical data. The histogram's
        // post-scan state is distinct-value-sized (l_quantity: 50 values,
        // l_extendedprice: ~price-list-sized) and does NOT grow with the
        // 10× replication — the sort path's per-group buffers do. Both
        // forms must emit identical rows.
        val liDir = "/tmp/stress_quantile"
        Tables.lineitem(spark, sf)
          .select("l_returnflag", "l_quantity", "l_extendedprice")
          .crossJoin(broadcast(spark.range(10))).drop("id")
          .repartition(32) // one row group = zero scan parallelism (see BASELINE.md)
          .write.mode("overwrite").parquet(s"$liDir/lineitem.parquet")
        def checksum(df: org.apache.spark.sql.DataFrame): Long =
          df.select(expr(
            "bit_xor(xxhash64(l_returnflag, qty_p25, qty_p50, qty_p75, price_p90))"))
            .head().getLong(0)
        // untimed warmup (JVM/codegen/page cache belong to neither form)
        checksum(relational.Relational.qQuantileHist(spark, liDir))
        checksum(relational.Relational.qPercentile(spark, liDir))
        var ch = 0L; var cs = 0L
        (1 to 3).foreach { i =>
          timed(s"quantile 6M histogram run$i") {
            ch = checksum(relational.Relational.qQuantileHist(spark, liDir)); ch
          }
          timed(s"quantile 6M sort-based run$i") {
            cs = checksum(relational.Relational.qPercentile(spark, liDir)); cs
          }
        }
        assert(ch == cs, s"forms disagree: $ch vs $cs")

      case "q1_warm" =>
        // A/B on the already-written 60M-row table, 3 warm runs each:
        // production two-level overflow-safe agg vs the single-level
        // long-sum formulation it replaced
        val li = "/tmp/stress_li"
        def single() = {
          def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
          val (qty, ep, disc, tax) =
            (cents(col("l_quantity")), cents(col("l_extendedprice")),
              cents(col("l_discount")), cents(col("l_tax")))
          Tables.lineitem(spark, li)
            .filter(col("l_shipdate") < lit("2000-01-01"))
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum(qty).as("sq"), sum(ep).as("se"),
              sum(ep * (lit(100L) - disc)).as("sd"),
              sum(ep * (lit(100L) - disc) * (lit(100L) + tax)).as("sc"),
              count(lit(1)).as("n"))
        }
        (1 to 3).foreach { i =>
          timed(s"q1 60M two-level run$i")(
            relational.Relational.q1Agg(spark, li).write.mode("overwrite").format("noop").save())
          timed(s"q1 60M single-level run$i")(
            single().write.mode("overwrite").format("noop").save())
        }

      case "bloom_decon_10x" =>
        // 50k docs (10× sf0.1, doc_id*10+rep keeps the %23 eval slice
        // distributed): D17 exact broadcast decontamination vs D17b's
        // bloom-prefiltered form on identical data. The numbers that
        // matter at 100 TB are the SIZES: what D17 must broadcast (the
        // full exploded eval shingle relation) vs the fixed bloom bytes,
        // and how many corpus shingles the prefilter kills before the
        // join. Wall time locally is expected to be a near-wash — in one
        // JVM the broadcast is a pointer hand-off; the scenario records
        // that honestly rather than claiming a local speedup.
        val base = Tables.documents(spark, sf)
        val docs10 = base
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select(((col("doc_id") * 10 + col("rep")).as("doc_id") +:
            base.columns.filter(_ != "doc_id").map(col)): _*)
        docs10.repartition(32).write.mode("overwrite")
          .parquet("/tmp/stress_bloomdecon/documents.parquet")
        val bd = "/tmp/stress_bloomdecon"
        def checksum(df: org.apache.spark.sql.DataFrame): Long =
          df.select(expr("bit_xor(xxhash64(doc_id, eval_id, n_hits))"))
            .head().getLong(0)
        // untimed warmup for both forms (Bench discipline)
        var ce = 0L; var cb = 0L
        checksum(ops.Dedup.decontaminate(spark, bd))
        checksum(ops.Dedup.decontaminateBloom(spark, bd))
        (1 to 3).foreach { i =>
          timed(s"decontaminate EXACT broadcast run$i") {
            ce = checksum(ops.Dedup.decontaminate(spark, bd)); ce }
          timed(s"decontaminate BLOOM prefilter run$i") {
            cb = checksum(ops.Dedup.decontaminateBloom(spark, bd)); cb }
        }
        assert(ce == cb, s"forms disagree: $ce vs $cb")
        // size accounting on the production relations (the views/functions
        // the operator itself registered): what the exact form broadcasts
        // vs what the bloom form ships + what survives to the join
        def selectivity(tag: String): Unit = {
          val evalStats = spark.sql(
            "SELECT count(*), sum(octet_length(shingle)) FROM graft_eval_sh").head()
          val corpusN = spark.sql("SELECT count(*) FROM graft_corpus_sh").head().getLong(0)
          val passN = spark.sql("""
            SELECT count(*) FROM graft_corpus_sh
            WHERE graft_might_contain(
              (SELECT graft_bloom_agg(xxhash64(shingle),
                 CAST(65536 AS BIGINT), CAST(1048576 AS BIGINT))
               FROM graft_eval_sh),
              xxhash64(shingle))""").head().getLong(0)
          println(f"[stress] $tag eval shingles: ${evalStats.getLong(0)} " +
            f"(~${evalStats.getLong(1) / 1048576.0}%.1f MiB of shingle text broadcast by " +
            f"D17; with eval_id + row overhead the actual broadcast is larger); " +
            f"bloom ships ${1048576 / 8 / 1024} KiB regardless")
          println(f"[stress] $tag corpus shingles: $corpusN, past bloom: $passN " +
            f"(${passN * 100.0 / corpusN}%.1f%% reach the join)")
        }
        selectivity("SATURATED")
        // The saturated case is the synthetic corpus's worst case: a
        // 31-word vocabulary means the eval slice covers ~the whole
        // 3-shingle space and the prefilter can kill almost nothing
        // (output still exact). Variant B salts every word with
        // doc_id%97 so cross-group shingles never match — the realistic
        // regime where eval text is a sliver of the corpus — and the
        // bloom should now be doing the killing it exists for.
        val salted = docs10.select(col("doc_id"),
          regexp_replace(col("text"), lit(" "),
            concat(lit(" g"), (col("doc_id") % 97).cast("string"), lit("_"))).as("text"))
        salted.repartition(32).write.mode("overwrite")
          .parquet("/tmp/stress_bloomdecon_b/documents.parquet")
        val bdB = "/tmp/stress_bloomdecon_b"
        var ceB = 0L; var cbB = 0L
        checksum(ops.Dedup.decontaminate(spark, bdB))
        checksum(ops.Dedup.decontaminateBloom(spark, bdB))
        (1 to 3).foreach { i =>
          timed(s"decontaminate SALTED exact run$i") {
            ceB = checksum(ops.Dedup.decontaminate(spark, bdB)); ceB }
          timed(s"decontaminate SALTED bloom run$i") {
            cbB = checksum(ops.Dedup.decontaminateBloom(spark, bdB)); cbB }
        }
        assert(ceB == cbB, s"salted forms disagree: $ceB vs $cbB")
        selectivity("SALTED")

      case "rolling_10x" =>
        // 1M events (10× sf0.1, ids distinct, timestamps as-is so per-day
        // distinct cardinality is UNCHANGED): B37's day-dedup-first
        // formulation vs the naive raw-event explode. The claim under
        // test: the production form's wire is ≤ 7·|distinct (user,day)|
        // rows no matter how many events repeat a (user, day), while the
        // naive form shuffles 7·|events|.
        val ev10 = Tables.events(spark, sf).select("user_id", "ts")
          .crossJoin(spark.range(10).select(col("id").as("rep")))
          .select(col("user_id"), col("ts"))
        ev10.repartition(32).write.mode("overwrite")
          .parquet("/tmp/stress_rolling/events.parquet")
        val rd = "/tmp/stress_rolling"
        def naive() = Tables.events(spark, rd)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .select(col("user_id"),
            explode(sequence(col("day"), date_add(col("day"), 6))).as("win_end"))
          .distinct()
          .groupBy("win_end").agg(count(lit(1)).as("n_users"))
          .select(date_format(col("win_end"), "yyyy-MM-dd").as("win_end_s"),
            col("n_users"))
        def checksum(df: org.apache.spark.sql.DataFrame): Long =
          df.select(expr("bit_xor(xxhash64(win_end_s, n_users))")).head().getLong(0)
        val shuffled = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null)
                shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
          })
        var cp = 0L; var cn = 0L
        checksum(relational.Relational.qRollingDistinct(spark, rd)) // warm
        checksum(naive())
        def shufOf(label: String)(f: => Long): Unit = {
          Thread.sleep(1000); shuffled.set(0L)
          timed(label)(f)
          Thread.sleep(1000)
          println(f"[stress] $label shuffle-records: ${shuffled.get}%d")
        }
        shufOf("rolling_distinct day-dedup-first (1M events)") {
          cp = checksum(relational.Relational.qRollingDistinct(spark, rd)); cp }
        shufOf("rolling_distinct naive raw explode (1M events)") {
          cn = checksum(naive()); cn }
        assert(cp == cn, s"forms disagree: $cp vs $cn")

      case "fk_elim_10x" =>
        // 6M lineitem rows joined to 150k bare order keys — the BI-view
        // join shape B38 exists for. A/B: rule OFF (real join; broadcast
        // disabled so it shuffles, the at-scale regime where the dim
        // outgrows broadcast) vs rule ON (join rewritten to a null
        // filter). Same aggregate output asserted both ways.
        val li10 = Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .crossJoin(broadcast(spark.range(10))).drop("id")
        li10.repartition(32).write.mode("overwrite")
          .parquet("/tmp/stress_fkelim/lineitem.parquet")
        Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice",
            "o_orderstatus", "o_orderdate", "o_orderpriority")
          .write.mode("overwrite").parquet("/tmp/stress_fkelim/orders.parquet")
        val fd = "/tmp/stress_fkelim"
        def q() = relational.Relational.qFkElim(spark, fd)
        def checksum(df: org.apache.spark.sql.DataFrame): Long =
          df.select(expr("bit_xor(xxhash64(l_returnflag, n, sum_qty))"))
            .head().getLong(0)
        val shuffled = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null)
                shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
          })
        def shufOf(label: String)(f: => Long): Long = {
          Thread.sleep(1000); shuffled.set(0L)
          var r = 0L
          timed(label) { r = f; r }
          Thread.sleep(1000)
          println(f"[stress] $label shuffle-records: ${shuffled.get}%d")
          r
        }
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // ON leg: qFkElim arms the rule in its own CHILD session (scoped
        // since the r10 advisor fix — parent conf toggles no longer reach
        // it, which silently broke the old flip-the-conf OFF leg). OFF
        // leg: the identical BI query built on the PARENT session, where
        // the rule is gated off — the real shuffle join.
        def qOff() = Tables.lineitem(spark, fd)
          .join(Tables.orders(spark, fd).select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("l_returnflag")
        assert(q().queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.isEmpty, "ON leg: rule failed to eliminate the join")
        assert(qOff().queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.nonEmpty, "OFF leg: join unexpectedly missing")
        checksum(q()); checksum(qOff()) // warmups, both shapes
        var cOn = 0L; var cOff = 0L
        cOn = shufOf("fk_elim ON (join deleted, 6M rows)") { checksum(q()) }
        cOff = shufOf("fk_elim OFF (real shuffle join, 6M rows)") { checksum(qOff()) }
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert(cOn == cOff, s"forms disagree: $cOn vs $cOff")

      case "agg_ceiling" =>
        // Memory-ceiling proof for the three TypedImperativeAggregates.
        // Run as SPARK_DRIVER_MEM=2g SPARK_GRAFT_CPUS=32 — a 2 GiB heap
        // shared by 32 concurrent tasks (~35 MiB of execution memory
        // each under the 0.6 memory fraction) over a 50M-row input with
        // 90% of rows on ONE hot group. Completion under that ceiling is
        // the proof the buffers hold what the scaladocs claim:
        //  - BitmapDistinct: the COMPRESSED key set. 45M dense longs
        //    run-length collapse to a few MiB; a raw long hash set is
        //    ≥ 720 MiB higher (45M × 16B entries) and cannot fit.
        //  - TopKAggregate: O(k)=3 (key, payload) pairs per group.
        //  - FrequentItemsSketch: O(k)=64 entries per buffer.
        // Reported: per-leg wall time, per-pool JVM heap high-water
        // (reset per leg), and the hot bitmap's serialized state size.
        val heapMiB = Runtime.getRuntime.maxMemory() >> 20
        println(s"[stress] agg_ceiling: max heap $heapMiB MiB, " +
          s"${spark.sparkContext.defaultParallelism} local threads")
        spark.range(50000000L).select(
            when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 31 + 1).as("g"),
            col("id").as("v"),
            ((col("id") * 2654435761L) % 1000000007L).as("price"),
            when(col("id") % 5 < 2, lit("the"))
              .otherwise(concat(lit("tok"), (col("id") % 997).cast("string"))).as("tok"))
          .repartition(32)
          .write.mode("overwrite").parquet("/tmp/stress_ceiling")
        val t = spark.read.parquet("/tmp/stress_ceiling")
        for ((nm, f) <- Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
            org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression)](
          "bitmap_distinct" -> (es => functions.BitmapDistinct(es.head).toAggregateExpression()),
          "bitmap_build" -> (es => functions.BitmapBuild(es.head).toAggregateExpression()),
          "topk_pairs_3" -> (es => functions.TopKAggregate(es(0), es(1), 3).toAggregateExpression()),
          "mg_64" -> (es => functions.FrequentItemsSketch(es.head, 64).toAggregateExpression())))
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(nm, f, "built-in")
        val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
          .stream().filter(_.getType == java.lang.management.MemoryType.HEAP)
          .toArray.toSeq.map(_.asInstanceOf[java.lang.management.MemoryPoolMXBean])
        def ceilingOf(label: String)(f: => Long): Unit = {
          Thread.sleep(1000); heapPools.foreach(_.resetPeakUsage())
          timed(label)(f)
          // per-pool peaks (eden/survivor/old hit theirs at different
          // moments — summing them would overstate the ceiling)
          val peaks = heapPools
            .map(p => s"${p.getName}:${p.getPeakUsage.getUsed >> 20}M").mkString(" ")
          println(s"[stress] $label: heap pool peaks $peaks")
        }
        ceilingOf("bitmap_distinct 50M rows, 45M distinct on hot key") {
          val r = t.groupBy("g").agg(call_function("bitmap_distinct", col("v")).as("nd")).collect()
          val hot = r.find(_.getLong(0) == 0L).get.getLong(1)
          assert(hot == 45000000L, s"hot-key distinct was $hot")
          assert(r.length == 32, s"${r.length} groups")
          r.length
        }
        val bmLen = t.filter(col("g") === 0L)
          .agg(call_function("bitmap_build", col("v")).as("bm"))
          .select(length(col("bm"))).head().getInt(0)
        println(f"[stress] hot-key bitmap serialized state: ${bmLen >> 10}%d KiB " +
          f"(raw 45M-long set would be >= ${45000000L * 16 >> 20}%d MiB)")
        ceilingOf("topk_3 per group, 50M rows") {
          val n = t.groupBy("g")
            .agg(call_function("topk_pairs_3", col("price"), col("v")).as("top"))
            .select(col("g"), posexplode(col("top"))).count()
          assert(n == 96L, s"expected 32 groups × 3, got $n") // 32 groups × k=3
          n
        }
        ceilingOf("misra-gries k=64, 50M rows") {
          val cands = t.agg(call_function("mg_64", col("tok")).as("c"))
            .select(explode(col("c"))).collect().map(_.getString(0))
          // 'the' holds a 40% share ≫ N/(k+1): the MG guarantee says it
          // MUST survive every decrement cascade, any partition order
          assert(cands.contains("the"), s"heavy hitter lost: ${cands.take(8).mkString(",")}")
          cands.length
        }

      case "curation_1000x" =>
        // The whole-pipeline soak: E7 + E13 end-to-end at 5M docs
        // (1000× the sf0.1 corpus) on local[32] — the shape where the
        // fused projection, its localCheckpoint staging, the content-
        // hash window and the shingle broadcast all compete for memory
        // at once. Corpus: each source doc replicated 1000×; every 4th
        // replica is an EXACT copy (dup groups of 250 per source doc —
        // the hash window's skew), the rest get a distinct trailing
        // token (near-dup volume). The eval holdout scales by modulus:
        // a real deployment holds the benchmark fixed while the corpus
        // grows, so evalMod goes 23 → 23000 and the broadcast side
        // stays ~217 docs — the operator's documented contract.
        // Recorded per leg: wall, summed task CPU, shuffle write,
        // memory/disk spill, heap pool peaks.
        val docs = Tables.documents(spark, sf)
        val rest = docs.columns.filterNot(c => c == "doc_id" || c == "text").map(col)
        docs.crossJoin(spark.range(1000).select(col("id").as("rep")))
          .select(((col("doc_id") * 1000 + col("rep")).as("doc_id") +:
            when(col("rep") % 4 === 0, col("text"))
              .otherwise(concat(col("text"), lit(" r"), col("rep"))).as("text") +:
            rest): _*)
          .repartition(32)
          .write.mode("overwrite").parquet("/tmp/stress_curation/documents.parquet")
        val cd = "/tmp/stress_curation"
        val nDocs = 5000000L
        val (taskMs, shufW, memSpill, diskSpill) = (
          new java.util.concurrent.atomic.AtomicLong, new java.util.concurrent.atomic.AtomicLong,
          new java.util.concurrent.atomic.AtomicLong, new java.util.concurrent.atomic.AtomicLong)
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskMetrics != null) {
                taskMs.addAndGet(te.taskMetrics.executorRunTime)
                shufW.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
                memSpill.addAndGet(te.taskMetrics.memoryBytesSpilled)
                diskSpill.addAndGet(te.taskMetrics.diskBytesSpilled)
              }
          })
        val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
          .stream().filter(_.getType == java.lang.management.MemoryType.HEAP)
          .toArray.toSeq.map(_.asInstanceOf[java.lang.management.MemoryPoolMXBean])
        def soak(label: String)(f: => Seq[org.apache.spark.sql.Row]): Seq[org.apache.spark.sql.Row] = {
          Thread.sleep(1000)
          Seq(taskMs, shufW, memSpill, diskSpill).foreach(_.set(0L))
          heapPools.foreach(_.resetPeakUsage())
          var out: Seq[org.apache.spark.sql.Row] = Nil
          timed(label) { out = f; out.length }
          Thread.sleep(1000) // listener bus drain
          val pools = heapPools
            .map(p => s"${p.getName.replace("G1 ", "")}:${p.getPeakUsage.getUsed >> 20}M")
          println(f"[stress] $label: task-cpu ${taskMs.get / 1000.0}%.0f s, " +
            f"shuffle-write ${shufW.get >> 20}%d MiB, " +
            f"spill mem ${memSpill.get >> 20}%d MiB / disk ${diskSpill.get >> 20}%d MiB, " +
            s"heap peaks ${pools.mkString(" ")}")
          out
        }
        val pipe = soak("E7 curate_pipeline, 5M docs") {
          ops.Curate.pipelineStaged(spark, cd, stage = true, evalMod = 23000L).collect().toSeq
        }
        val kept = pipe.map(_.getLong(1)).sum
        println(s"[stress] pipeline kept $kept docs over ${pipe.length} langs")
        assert(kept > 0, "pipeline kept nothing")
        val funnel = soak("E13 curation_funnel, 5M docs") {
          ops.Curate.curationFunnelStaged(spark, cd, stage = true, evalMod = 23000L).collect().toSeq
        }
        funnel.foreach(r => println(s"[stress]   ${r.getString(0)}: " +
          s"${r.getLong(1)} docs, ${r.getLong(2)} tokens"))
        // first-fail stages partition the corpus: the funnel must sum to
        // EXACTLY the input — the loss-dashboard property, held at 5M
        val total = funnel.map(_.getLong(1)).sum
        assert(total == nDocs, s"funnel sums to $total, expected $nDocs")

      case "stream_soak" =>
        // Long-horizon proof that watermark-bounded state PLATEAUS: the
        // chained stateful rolling-distinct (dedup → windowed agg, two
        // state stores) driven for 200 micro-batches / ~33 hours of event
        // time over a 10k-user universe. If eviction works, state rows
        // reach keys × in-horizon windows and stay there; a leak (or a
        // missing watermark) shows as monotonic growth across the run.
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import spark.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
        val events = mem.toDF().toDF("ts", "user_id", "value")
        val q = streaming.Streams.rollingDistinctStream(events, watermark = "2 hours")
          .writeStream.format("noop").outputMode("append").start()
        val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        val states = new scala.collection.mutable.ArrayBuffer[Long]
        timed("stream_soak: 200 micro-batches, 33h event time") {
          (0 until 200).foreach { b =>
            val t0 = base + b.toLong * 10 * 60 * 1000 // 10 min per batch
            val rows = (0 until 1000).map { i =>
              (new java.sql.Timestamp(t0 + (i % 600) * 1000L),
                ((b * 7919 + i * 104729) % 10000).toLong,
                (i % 97).toDouble)
            }
            mem.addData(rows)
            q.processAllAvailable()
            states += Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
          }
          states.size
        }
        q.stop()
        val warm = states.slice(60, 120).max
        val late = states.slice(140, 200).max
        println(s"[stress] state rows: batch10=${states(10)} batch60=${states(60)} " +
          s"batch120=${states(119)} batch200=${states.last}; warm-max $warm, late-max $late")
        assert(late <= (warm * 1.15).toLong,
          s"state kept growing: warm-max $warm vs late-max $late — eviction not bounding state")

        // Second leg: the C15 as-of state contract — event state DRAINS as
        // the watermark advances; what persists is one dimension (order)
        // row per key. 100 batches over 5k keys; final state ≈ keys, not
        // traffic.
        val mem2 = MemoryStream[streaming.Streams.AsofIn]
        val q2 = streaming.Streams.asofStream(mem2.toDS())
          .writeStream.format("noop").outputMode("append").start()
        val nKeys = 5000
        var emitted = 0L
        timed("stream_soak: C15 as-of, 100 batches, 5k keys") {
          (0 until 100).foreach { b =>
            val t0 = base + b.toLong * 10 * 60 * 1000
            val rows = (0 until 500).map { i =>
              val k = ((b * 31 + i * 97) % nKeys).toLong
              if (i % 5 == 0)
                streaming.Streams.AsofIn(k, new java.sql.Timestamp(t0 + i * 1000L),
                  is_order = true, b.toLong * 1000 + i, 12345L, -1L)
              else
                streaming.Streams.AsofIn(k, new java.sql.Timestamp(t0 + i * 1000L),
                  is_order = false, -1L, 0L, b.toLong * 100000 + i)
            }
            mem2.addData(rows)
            q2.processAllAvailable()
          }
          // push the watermark far past all traffic so event state drains
          mem2.addData(streaming.Streams.AsofIn(0L,
            new java.sql.Timestamp(base + 10L * 24 * 3600 * 1000), is_order = false, -1L, 0L, -2L))
          q2.processAllAvailable()
          emitted = 1L
        }
        val finalState = Option(q2.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        q2.stop()
        println(s"[stress] C15 final state rows: $finalState over $nKeys keys (dimension rows + 1 pending)")
        assert(finalState <= nKeys + 10,
          s"as-of state did not drain to dimension rows: $finalState")

      case "ann_clustered" =>
        // Executable evidence for the §9 claim that ANN recall is bound by
        // DATA, not the operators: the testdata vectors are structureless
        // (recall ≈ probed fraction — measured 0.38 for IVF at nprobe 3/10).
        // Here the same operators run on CLUSTERED vectors — 10 well-
        // separated deterministic centroids (LCG, no RNG) + small per-vector
        // perturbation — where a query's true neighbors share its cluster.
        // Expectation: IVF recall@10 ≈ 1.0 probing the same 3/10 clusters.
        val dim = 64
        var st = 99L
        def nxt(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
        val cents = (0 until 10).map(l => (0 until dim).map(_ => (nxt() % 2000L).toFloat / 1000f))
        val centLit = typedlit(cents)
        val base = spark.range(20000).select(
          col("id").as("vec_id"), (col("id") % 10).cast("int").as("label"))
        val clustered = base.select(col("vec_id"), col("label"),
          transform(element_at(centLit, col("label") + 1),
            (c, i) => c + (pmod(xxhash64(col("vec_id"), i), lit(100)).cast("float") - 50f) / lit(500f))
            .as("embedding"))
        clustered.select("vec_id", "embedding", "label").repartition(16)
          .write.mode("overwrite").parquet("/tmp/stress_annc/embeddings.parquet")
        val dd = "/tmp/stress_annc"
        val bf = ops.Similarity.annBruteforce(spark, dd)
          .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val ivf = ops.Similarity.annIvf(spark, dd)
          .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = ivf.count(bf).toDouble / bf.size
        println(f"[stress] ann_clustered: IVF recall@10 = $recall%.3f over ${bf.size} truth pairs (nprobe 3/10)")
        assert(recall >= 0.9, f"clustered recall $recall%.3f — operators should capture the local neighborhood")
        val lsh = ops.Similarity.annLsh(spark, dd)
          .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val lshRecall = lsh.count(bf).toDouble / bf.size
        println(f"[stress] ann_clustered: LSH recall@10 = $lshRecall%.3f (own bucket + hamming-1 probes)")
        assert(lshRecall >= 0.7, f"clustered LSH recall $lshRecall%.3f")

      case "q5_100x" =>
        // The missing big-shuffle record: the FULL q5 star at 100× — 60M
        // lineitem ⋈ 1.5M orders (both fact sides shuffle on the order
        // key; order keys remapped so join multiplicity is preserved),
        // customer/supplier fixed (AQE picks their join strategy),
        // nation/region broadcast. q1_100x covers scan+agg, skew_100x
        // covers hot keys; this is the plain massive equi-join every
        // warehouse lives on.
        val dir5 = "/tmp/stress_q5"
        Tables.lineitem(spark, sf)
          .crossJoin(spark.range(100).select(col("id").as("rep")))
          .select((col("l_orderkey") * 100 + col("rep")).as("l_orderkey"),
            col("l_partkey"), col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
          .repartition(32).write.mode("overwrite").parquet(s"$dir5/lineitem.parquet")
        Tables.orders(spark, sf)
          .crossJoin(spark.range(100).select(col("id").as("rep")))
          .select((col("o_orderkey") * 100 + col("rep")).as("o_orderkey"),
            col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderdate"), col("o_orderpriority"))
          .repartition(32).write.mode("overwrite").parquet(s"$dir5/orders.parquet")
        Seq("customer", "supplier", "nation", "region").foreach { t =>
          Tables(spark, sf, t).write.mode("overwrite").parquet(s"$dir5/$t.parquet")
        }
        relational.Relational.q5Join(spark, dir5).write.mode("overwrite").format("noop").save() // warm
        (1 to 3).foreach { i =>
          timed(s"q5_join 60M⋈1.5M rows (run $i)")(
            relational.Relational.q5Join(spark, dir5).write.mode("overwrite").format("noop").save())
        }
        // Structural A/B on the expensive edge (l⋈o): the same join over
        // tables BUCKETED on the order key plans ZERO exchange for that
        // edge — the layout a recurring warehouse earns back every run.
        // Bucket count 32 so each bucket's build side fits comfortably.
        locally {
          import org.apache.spark.sql.functions._
          relational.Bucketing.reset(spark, "q5x_li"); relational.Bucketing.reset(spark, "q5x_or")
          timed("bucket-write lineitem 60M + orders 1.5M (one-time layout cost)") {
            relational.Bucketing.writeBucketed(spark.read.parquet(s"$dir5/lineitem.parquet")
              .select("l_orderkey", "l_extendedprice", "l_discount"), "q5x_li", "l_orderkey", 32)
            relational.Bucketing.writeBucketed(spark.read.parquet(s"$dir5/orders.parquet")
              .select("o_orderkey", "o_orderpriority"), "q5x_or", "o_orderkey", 32)
          }
          def joinAgg(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
            l.join(o, col("l_orderkey") === col("o_orderkey"))
              .groupBy("o_orderpriority")
              .agg(count(lit(1)).as("n"), sum((col("l_extendedprice") * 100).cast("long")).as("rev_c"))
          val shuffled = joinAgg(
            spark.read.parquet(s"$dir5/lineitem.parquet").select("l_orderkey", "l_extendedprice", "l_discount"),
            spark.read.parquet(s"$dir5/orders.parquet").select("o_orderkey", "o_orderpriority"))
          val bucketed = joinAgg(spark.table("q5x_li"), spark.table("q5x_or"))
          val a = shuffled.collect().map(_.toSeq).toSet
          val b = bucketed.collect().map(_.toSeq).toSet
          assert(a == b, "bucketed join changed the result")
          def best3(label: String)(f: => Unit): Unit = {
            f
            val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
            println(f"[stress] $label: min ${ts.min}%.1f s of ${ts.map(t => f"$t%.1f").mkString("/")}")
          }
          best3("l⋈o 60M shuffle join+agg")(shuffled.write.mode("overwrite").format("noop").save())
          best3("l⋈o 60M BUCKETED join+agg (zero-exchange edge)")(
            bucketed.write.mode("overwrite").format("noop").save())
          val p = bucketed.queryExecution.executedPlan.toString
          val keyExchanges = p.split("\n").count(l => l.contains("Exchange") && l.contains("orderkey"))
          println(s"[stress] bucketed-plan order-key exchanges: $keyExchanges (expect 0)")
          assert(keyExchanges == 0, p)
        }

      case "tpch_gaps_10x" =>
        // The round's heaviest new shapes at 10× fact growth with FIXED
        // dims (the realistic scale-up: facts grow, catalogs don't):
        // 6M-row lineitem against the unchanged orders/part/supplier.
        // q_suppcnt's distinct-supplier dedup, q_returns' fact-fact join +
        // TakeOrdered, and q_smallqty's full-fact per-part threshold
        // aggregate are the three that pay fact-proportional work.
        val dir = "/tmp/stress_tpch"
        val big = Tables.lineitem(spark, sf)
          .crossJoin(spark.range(10).select(col("id").as("rep"))).drop("rep")
        big.repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        Seq("orders", "part", "supplier", "customer", "nation").foreach { t =>
          Tables(spark, sf, t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
        }
        // untimed warmup (JVM/codegen)
        relational.TpchGaps.qForecast(spark, dir).write.mode("overwrite").format("noop").save()
        timed("q_forecast 6M rows")(
          relational.TpchGaps.qForecast(spark, dir).write.mode("overwrite").format("noop").save())
        timed("q_suppcnt 6M rows (distinct suppliers per class)")(
          relational.TpchGaps.qSuppcnt(spark, dir).write.mode("overwrite").format("noop").save())
        // A/B: the same query under the B16 bitmap rewrite (child session,
        // rule armed by conf — the query text doesn't change). The
        // count(DISTINCT suppkey) per (type, size) becomes a roaring-bitmap
        // aggregate: one shuffle of fixed-size bitmaps instead of the
        // two-phase distinct expansion.
        locally {
          val scoped = spark.newSession()
          scoped.conf.set("spark.graft.bitmapDistinct.enabled", "true")
          timed("q_suppcnt 6M rows (B16 bitmap rewrite)")(
            relational.TpchGaps.qSuppcnt(scoped, dir).write.mode("overwrite").format("noop").save())
          val a = relational.TpchGaps.qSuppcnt(spark, dir).collect().map(_.toSeq).toSet
          val b = relational.TpchGaps.qSuppcnt(scoped, dir).collect().map(_.toSeq).toSet
          assert(a == b, "bitmap rewrite changed q_suppcnt's result")
          println(s"[stress] bitmap rewrite output identical: ${a.size} rows")
        }
        timed("q_returns 6M rows (fact-fact + top-20)")(
          relational.TpchGaps.qReturns(spark, dir).write.mode("overwrite").format("noop").save())
        timed("q_smallqty 6M rows (per-part threshold)")(
          relational.TpchGaps.qSmallqty(spark, dir).write.mode("overwrite").format("noop").save())
        timed("q_profit 6M rows (5-way star)")(
          relational.TpchGaps.qProfit(spark, dir).write.mode("overwrite").format("noop").save())

      case "band_10x" =>
        // B14b's scale story, measured: the banded equi-join form vs the
        // naive non-equi join (BNLJ when one side broadcasts) on the SAME
        // band predicate. Naive work is |ev|·|ord| comparisons — ×100 per
        // decade of scale; banded wire is 2·|ev|+|ord| rows — ×10. The
        // A/B runs where the quadratic leg is still feasible (sf0.01,
        // sf0.1), checksum-asserted identical; the 10× leg runs banded
        // only, with the naive side's comparison count stated as the
        // reason it is absent.
        def cks(df: org.apache.spark.sql.DataFrame): Long =
          df.collect().map(_.toString.hashCode.toLong).sum
        def legs(d: String, label: String): (Long, Long) = {
          val (ev, ord) = relational.Relational.bandedInputs(spark, d)
          var a = 0L; var b = 0L
          timed(s"banded $label")(
            { a = cks(relational.Relational.rangeJoinBandedOn(ev, ord)); a })
          timed(s"naive BNLJ $label")(
            { b = cks(relational.Relational.rangeJoinNaiveOn(ev, ord)); b })
          (a, b)
        }
        // untimed warmup (codegen + page cache)
        cks(relational.Relational.rangeJoinBanded(spark, "/root/testdata/sf0.01"))
        val (a1, b1) = legs("/root/testdata/sf0.01", "sf0.01 (10k ev × 15k ord, 1.5e8 cmp)")
        assert(a1 == b1, "banded and naive must agree at sf0.01")
        val (a2, b2) = legs(sf, "sf0.1 (100k ev × 150k ord, 1.5e10 cmp)")
        assert(a2 == b2, "banded and naive must agree at sf0.1")
        // 10×: replicate rows verbatim (pair volume ×100, row volume ×10)
        val (ev10, ord10) = {
          val (e, o) = relational.Relational.bandedInputs(spark, sf)
          val reps = broadcast(spark.range(10).select(col("id").as("__r")))
          (e.crossJoin(reps).drop("__r"), o.crossJoin(reps).drop("__r"))
        }
        timed("banded 10x sf0.1 (1M ev × 1.5M ord; naive would be 1.5e12 cmp — not run)")(
          cks(relational.Relational.rangeJoinBandedOn(ev10, ord10)))

      case "snap_1000x" =>
        // A31 at manifest-chain depth: 1,000 appended single-file
        // releases (the nightly-drop shape, three years of dailies).
        // Claims measured: (1) per-release publish cost stays flat —
        // the manifest append is O(chain) lines of text, invisible next
        // to the file write; (2) the read path scales with FILE COUNT,
        // never history depth (readAt parses ONE manifest — no walk of
        // 999 predecessors); (3) per-release CDC opens exactly one
        // file at ANY depth; (4) maintenance at depth: compaction folds
        // 1,000 files → 8, retention GC then reclaims the entire
        // superseded history in one sweep, table intact.
        val root = java.nio.file.Files.createTempDirectory("graft_snap1000")
        def release(i: Int) =
          spark.range((i - 1) * 1000L, i.toLong * 1000L)
            .select(col("id").as("k"), (col("id") % 7).as("v")).coalesce(1)
        def publishSpan(range: Range): Double = {
          val t0 = System.nanoTime()
          range.foreach(i => etl.Snapshots.publish(spark, root, release(i), append = true))
          (System.nanoTime() - t0) / 1e9 / range.size
        }
        val head = publishSpan(1 to 100)
        publishSpan(101 to 900)
        val tail = publishSpan(901 to 1000)
        println(f"[stress] snap_1000x publish per-release: first-100 $head%.3f s, " +
          f"last-100 $tail%.3f s (flat ⇒ chain depth is free)")
        timed("readCurrent over the 1000-file manifest (1M rows)")(
          etl.Snapshots.readCurrent(spark, root).count())
        timed("time travel to snapshot 500 (500k rows, one manifest parse)")(
          etl.Snapshots.readAt(spark, root, 500).count())
        timed("per-release CDC at depth 1000") {
          val inc = etl.Snapshots.readChanges(spark, root, 999, 1000)
          val files = inc.inputFiles.length
          assert(files == 1, s"CDC opened $files files")
          s"1 file, ${inc.count()} rows"
        }
        timed("compact 1000 files -> 8")(etl.Snapshots.compact(spark, root, 8))
        timed("expire the 1000-release history") {
          val (n, bytes) = etl.Snapshots.expire(root, keepFrom = 1001)
          assert(n == 1000, s"swept $n files")
          f"$n files, ${bytes / 1e6}%.1f MB"
        }
        assert(etl.Snapshots.readCurrent(spark, root).count() == 1000000L)
        println("[stress] snap_1000x: post-GC table intact at 1,000,000 rows")

      case "rocksdb_soak" =>
        // VERDICT r11 item 4: the chained stateful soaks re-run on the
        // RocksDB state-store provider — at 100 TB state lives off-heap,
        // and the in-memory-provider plateau proof (stream_soak) says
        // nothing about the provider a real cluster runs. Two claims:
        // (1) PARITY — both soak legs emit bit-identical output under
        // RocksDB and the default HDFS-backed provider (same MemoryStream
        // batch script ⇒ same appended rows); (2) the state-row PLATEAU
        // and the C15 drain-to-dimension contract hold unchanged, with
        // RocksDB's own memory accounting recorded.
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import spark.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        val hdfsProvider =
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
        val rocksProvider =
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

        def checksum(rows: Seq[org.apache.spark.sql.Row]): Long =
          rows.map(_.toString.hashCode.toLong).sorted.foldLeft(0L)((a, h) => a * 1048573L + h)

        // ---- leg 1: chained rolling-distinct (two state stores) ----
        def rollingLeg(provider: String, tag: String): (Long, Long, Long, Long, Seq[String]) = {
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
          val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
          val events = mem.toDF().toDF("ts", "user_id", "value")
          val q = streaming.Streams.rollingDistinctStream(events, watermark = "2 hours")
            .writeStream.format("memory").queryName(s"rocks_roll_$tag")
            .outputMode("append").start()
          val states = new scala.collection.mutable.ArrayBuffer[Long]
          (0 until 200).foreach { b =>
            val t0 = base + b.toLong * 10 * 60 * 1000
            mem.addData((0 until 1000).map { i =>
              (new java.sql.Timestamp(t0 + (i % 600) * 1000L),
                ((b * 7919 + i * 104729) % 10000).toLong, (i % 97).toDouble)
            })
            q.processAllAvailable()
            states += Option(q.lastProgress)
              .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
          }
          val memBytes = Option(q.lastProgress)
            .map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(-1L)
          val custom = {
            import scala.jdk.CollectionConverters._
            Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
              .flatMap(_.customMetrics.entrySet().iterator().asScala.toSeq)
              .filter(e => e.getKey.contains("MemoryUsage") || e.getKey.contains("SstFile"))
              .map(e => s"${e.getKey}=${e.getValue}")
          }
          val out = spark.table(s"rocks_roll_$tag").collect().toSeq
          q.stop()
          (checksum(out), out.size.toLong,
            states.slice(60, 120).max, states.slice(140, 200).max, custom)
        }

        // ---- leg 2: C15 as-of state machine (drain contract) ----
        def asofLeg(provider: String, tag: String): (Long, Long, Long) = {
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
          val mem2 = MemoryStream[streaming.Streams.AsofIn]
          val q2 = streaming.Streams.asofStream(mem2.toDS())
            .writeStream.format("memory").queryName(s"rocks_asof_$tag")
            .outputMode("append").start()
          val nKeys = 5000
          (0 until 100).foreach { b =>
            val t0 = base + b.toLong * 10 * 60 * 1000
            mem2.addData((0 until 500).map { i =>
              val k = ((b * 31 + i * 97) % nKeys).toLong
              if (i % 5 == 0)
                streaming.Streams.AsofIn(k, new java.sql.Timestamp(t0 + i * 1000L),
                  is_order = true, b.toLong * 1000 + i, 12345L, -1L)
              else
                streaming.Streams.AsofIn(k, new java.sql.Timestamp(t0 + i * 1000L),
                  is_order = false, -1L, 0L, b.toLong * 100000 + i)
            })
            q2.processAllAvailable()
          }
          mem2.addData(streaming.Streams.AsofIn(0L,
            new java.sql.Timestamp(base + 10L * 24 * 3600 * 1000),
            is_order = false, -1L, 0L, -2L))
          q2.processAllAvailable()
          val fin = Option(q2.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
          val out = spark.table(s"rocks_asof_$tag").collect().toSeq
          q2.stop()
          (checksum(out), out.size.toLong, fin)
        }

        try {
          var rolled: (Long, Long, Long, Long, Seq[String]) = null
          timed("rolling soak, 200 batches, HDFS-backed provider") {
            rolled = rollingLeg(hdfsProvider, "hdfs"); rolled._2
          }
          val rollHdfs = rolled
          timed("rolling soak, 200 batches, RocksDB provider") {
            rolled = rollingLeg(rocksProvider, "rocks"); rolled._2
          }
          val rollRocks = rolled
          println(s"[stress] rolling parity: hdfs checksum=${rollHdfs._1} rows=${rollHdfs._2}, " +
            s"rocksdb checksum=${rollRocks._1} rows=${rollRocks._2}")
          println(s"[stress] rolling plateau under rocksdb: warm-max ${rollRocks._3}, " +
            s"late-max ${rollRocks._4}; rocksdb metrics: ${rollRocks._5.mkString(", ")}")
          assert(rollHdfs._1 == rollRocks._1 && rollHdfs._2 == rollRocks._2,
            "provider changed the rolling-distinct output")
          assert(rollRocks._4 <= (rollRocks._3 * 1.15).toLong,
            s"state grew under RocksDB: warm ${rollRocks._3} late ${rollRocks._4}")

          var asofRes: (Long, Long, Long) = null
          timed("C15 as-of soak, 100 batches, HDFS-backed provider") {
            asofRes = asofLeg(hdfsProvider, "hdfs"); asofRes._2
          }
          val asofHdfs = asofRes
          timed("C15 as-of soak, 100 batches, RocksDB provider") {
            asofRes = asofLeg(rocksProvider, "rocks"); asofRes._2
          }
          val asofRocks = asofRes
          println(s"[stress] C15 parity: hdfs checksum=${asofHdfs._1} rows=${asofHdfs._2}, " +
            s"rocksdb checksum=${asofRocks._1} rows=${asofRocks._2}; " +
            s"final state hdfs=${asofHdfs._3} rocksdb=${asofRocks._3} over 5000 keys")
          assert(asofHdfs._1 == asofRocks._1 && asofHdfs._2 == asofRocks._2,
            "provider changed the as-of matches")
          assert(asofRocks._3 <= 5010, s"as-of state did not drain: ${asofRocks._3}")
        } finally
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", hdfsProvider)

      case "occ_storm" =>
        // Optimistic concurrency at writer scale: 8 writers × 4 appends
        // of 250k rows each (8M rows total) land on one store, A/B'd
        // against publishLocked doing the identical work. The claim:
        // the OCC critical section is the metadata commit only, so
        // writers overlap their DATA writes and total wall-clock drops;
        // correctness is absolute either way (32 distinct snapshots,
        // exact final count, every manifest verify clean). Order runs
        // locked-first so warmup favors the INCUMBENT, not the claim.
        val writers = 8; val each = 4; val rows = 250000L
        def blockFor(w: Int, i: Int) =
          spark.range((w * each + i) * rows, (w * each + i + 1) * rows)
            .select(col("id").as("k"), (col("id") % 97).as("v")).repartition(4)
        def storm(label: String)(pub: (java.nio.file.Path, Int, Int) => Int): Double = {
          val root = java.nio.file.Files.createTempDirectory(s"graft_occstorm_$label")
          val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
          val t0 = System.nanoTime()
          val tasks = (0 until writers).map { w =>
            pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
              def call(): Seq[Int] = (0 until each).map(i => pub(root, w, i))
            })
          }
          val ids = tasks.flatMap(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
          val secs = (System.nanoTime() - t0) / 1e9
          pool.shutdown()
          assert(ids.sorted == (1 to writers * each), s"$label id loss: ${ids.sorted}")
          val n = etl.Snapshots.readCurrent(spark, root).count()
          assert(n == writers * each * rows, s"$label lost rows: $n")
          assert(etl.Snapshots.verify(root, etl.Snapshots.currentId(root).get).isEmpty)
          println(f"[stress] occ_storm $label: ${writers * each} commits, $n rows, $secs%.1f s")
          secs
        }
        val locked = storm("locked") { (root, w, i) =>
          etl.Snapshots.publishLocked(spark, root, blockFor(w, i), append = true)
        }
        val occ = storm("occ") { (root, w, i) =>
          etl.Snapshots.publishOcc(spark, root, blockFor(w, i))
        }
        println(f"[stress] occ_storm: locked $locked%.1f s vs occ $occ%.1f s = " +
          f"${locked / occ}%.2fx (data writes overlap; only the pointer commit serializes)")

      case "zorder_6m" =>
        // Z-order at 6M rows / 64 files: publish a 2448x2448 grid
        // unclustered, compactZOrder on (x, y), then measure BOTH
        // dimensions' slab reads as opened-file fractions and wall-clock
        // vs the full merged read. The 100 TB claim: a z-ordered layout
        // bounds EITHER dimension's 1/8-slab to a ~1/8-ish file subset
        // (single-column clustering leaves one dimension at 100%), and
        // pruning is pure I/O savings — counts equal the full-scan
        // filter's exactly.
        val side = 2448L
        val root = java.nio.file.Files.createTempDirectory("graft_z6m")
        val grid = spark.range(side * side).select(
          (col("id") / side).cast("long").as("x"),
          (col("id") % side).cast("long").as("y"))
        timed("publish 6M rows unclustered (32 files)")(
          etl.Snapshots.publish(spark, root, grid.repartition(32)))
        timed("compactZOrder -> 64 files, stats on both dims")(
          etl.Snapshots.compactZOrder(spark, root, 64, "x", "y"))
        val zid = etl.Snapshots.currentId(root).get
        val total = etl.Snapshots.manifest(root, zid).size
        val fullT0 = System.nanoTime()
        val full = etl.Snapshots.readAt(spark, root, zid)
          .filter(col("x") < side / 8).count()
        val fullSecs = (System.nanoTime() - fullT0) / 1e9
        for (c <- Seq("x", "y")) {
          val t0 = System.nanoTime()
          val pruned = etl.Snapshots.readPrunedOn(spark, root, zid, c, 0L, side / 8 - 1)
          val n = pruned.count()
          val secs = (System.nanoTime() - t0) / 1e9
          val opened = pruned.inputFiles.length
          assert(n == (side / 8) * side, s"$c slab dropped rows: $n")
          println(f"[stress] zorder_6m $c-slab: $opened/$total files, $n rows, " +
            f"$secs%.2f s (full-scan filter: $fullSecs%.2f s)")
          assert(opened * 4 <= total, s"$c slab pruned weakly: $opened of $total")
        }

      case "txn_scale" =>
        // A32 at catalog scale: 100 tables founded in ONE transaction
        // (2M rows), then a 200-version chain of single-table commits.
        // Claims: (1) the catalog COMMIT itself is metadata-only — one
        // version file write + rename, milliseconds regardless of table
        // count or data volume; (2) per-commit cost stays flat as the
        // version chain deepens; (3) a consistent 100-table read
        // resolves ONE version and conserves every row; (4) catalog
        // expire at depth reclaims a rewritten table's superseded chain
        // without touching retained state.
        val cat = java.nio.file.Files.createTempDirectory("graft_txnscale")
        val nTables = 100
        val names = (0 until nTables).map(i => f"t$i%03d")
        val founded = names.zipWithIndex.map { case (t, i) =>
          t -> etl.Snapshots.stageOnto(spark, etl.TxnCatalog.tableRoot(cat, t),
            spark.range(i * 20000L, (i + 1) * 20000L).select(col("id").as("k")).coalesce(1),
            None)
        }.toMap
        val tCommit0 = System.nanoTime()
        etl.TxnCatalog.commit(cat, founded, None)
        println(f"[stress] txn_scale: 100-table founding COMMIT (metadata only): " +
          f"${(System.nanoTime() - tCommit0) / 1e6}%.1f ms")
        def chainSpan(range: Range): Double = {
          val t0 = System.nanoTime()
          range.foreach { i =>
            val t = names(i % nTables)
            val v = etl.TxnCatalog.version(cat).get
            val base = etl.TxnCatalog.mapping(cat, v)(t)
            val staged = etl.Snapshots.stageOnto(spark, etl.TxnCatalog.tableRoot(cat, t),
              spark.range(1000L).select((col("id") + 1000000L * i).as("k")).coalesce(1),
              Some(base))
            etl.TxnCatalog.commit(cat, Map(t -> staged), Some(v))
          }
          (System.nanoTime() - t0) / 1e9 / range.size
        }
        val head = chainSpan(0 until 50)
        chainSpan(50 until 150)
        val tail = chainSpan(150 until 200)
        println(f"[stress] txn_scale per-commit: first-50 $head%.3f s, " +
          f"last-50 $tail%.3f s (flat => version depth is free)")
        val tRead0 = System.nanoTime()
        val vFinal = etl.TxnCatalog.version(cat).get
        val total = names.map(t =>
          etl.TxnCatalog.readTableAt(spark, cat, t, vFinal).count()).sum
        assert(total == nTables * 20000L + 200 * 1000L, s"conservation broke: $total")
        println(f"[stress] txn_scale: consistent 100-table read at depth $vFinal: " +
          f"$total rows in ${(System.nanoTime() - tRead0) / 1e9}%.1f s")
        // rewrite ONE table, expire everything below the new version
        val rebuiltBase = etl.TxnCatalog.mapping(cat, vFinal)(names.head)
        val rebuilt = etl.Snapshots.stageOnto(spark, etl.TxnCatalog.tableRoot(cat, names.head),
          etl.Snapshots.readAt(spark, etl.TxnCatalog.tableRoot(cat, names.head), rebuiltBase)
            .repartition(2), None)
        val vLast = etl.TxnCatalog.commit(cat, Map(names.head -> rebuilt), Some(vFinal))
        timed(s"catalog expire at depth $vLast") {
          val (files, bytes) = etl.TxnCatalog.expire(cat, keepFrom = vLast)
          assert(files > 0, "rewrite chain not reclaimed")
          f"$files files, ${bytes / 1e6}%.1f MB"
        }
        val after = names.map(t => etl.TxnCatalog.readTable(spark, cat, t).count()).sum
        assert(after == total, s"post-GC conservation broke: $after")
        println("[stress] txn_scale: post-GC catalog intact")

      case "dag_100k" =>
        // A29 at a fan three orders past the bench shape: 100k jobs per fan
        // stage (500k total) through the worker-pull runner. The claim under
        // test is the scale contract, not speed: thread count stays
        // O(capacity) — a watcher samples Thread.activeCount through the
        // run — and the trace relation still matches the sequential
        // interpreter's outcome arithmetic exactly at this size.
        val dbs = (0 until 100000).map(i => f"db_$i%06d_core_110_1")
        val jobsOf = (st: String) =>
          if (etl.Dag.fanStages.contains(st)) dbs else Seq(etl.Dag.controlJob)
        val baseThreads = Thread.activeCount()
        val peakThreads = new java.util.concurrent.atomic.AtomicInteger(0)
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val watcher = new Thread(() => {
          while (!stop.get()) {
            peakThreads.getAndAccumulate(Thread.activeCount(), Math.max(_, _))
            Thread.sleep(5)
          }
        })
        watcher.setDaemon(true); watcher.start()
        var res: etl.Dag.DagResult = null
        timed("dag_100k: 500k jobs through the beekeeper") {
          res = etl.Dag.run(etl.Dag.pipeline, jobsOf, (st, j, attempt) =>
            if (attempt <= etl.Dag.failCount(st, j))
              throw new RuntimeException(s"injected $st/$j/$attempt"))
          res.jobs.size
        }
        stop.set(true)
        println(s"[stress] threads: base $baseThreads, peak ${peakThreads.get} " +
          s"(fan 100000, max stage capacity ${etl.Dag.pipeline.map(_.capacity).max})")
        // worker-pull contract: extra threads ≤ Σ capacities of stages that
        // can run concurrently + scheduler/watcher slack, NEVER O(fan)
        assert(peakThreads.get - baseThreads < 64,
          s"thread explosion: peak ${peakThreads.get} over base $baseThreads")
        // outcome arithmetic at 100k: replay the script sequentially
        val expected = etl.Dag.pipeline.map { st =>
          val js = jobsOf(st.name)
          val failed = js.count(j => etl.Dag.failCount(st.name, j) > st.maxRetries)
          st.name -> (js.size, failed)
        }.toMap
        val gotByStage = res.jobs.groupBy(_.stage)
        etl.Dag.pipeline.foreach { st =>
          val got = gotByStage(st.name)
          assert(got.size == expected(st.name)._1, s"${st.name} job count")
          if (res.stages(st.name).status != "SKIPPED")
            assert(got.count(_.outcome == "FAILED") == expected(st.name)._2,
              s"${st.name} failed count")
        }
        println(s"[stress] stage statuses: " +
          etl.Dag.pipeline.map(st => s"${st.name}=${res.stages(st.name).status}").mkString(", "))

      case "catalog_6m" =>
        // A34 at 6M rows / 64 files: row-level SQL statements through
        // the DSv2 catalog, measured as files-rewritten fractions and
        // wall-clock. Claims: (1) an UPDATE whose condition zone-maps to
        // one key slab rewrites O(affected files) — the other ~62 files
        // are carried byte-identical (manifest paths + original seqs),
        // never read, never written; (2) the SAME statement on an
        // identical table WITHOUT zone maps rewrites all 64 files —
        // the A/B prices what the stats column buys; (3) DELETE's
        // metadata-only path shows the same locality; (4) answers are
        // conservation-exact in all legs.
        val nc = 6L * 1000 * 1000
        val wh = java.nio.file.Files.createTempDirectory("graft_cat6")
        spark.conf.set("spark.sql.catalog.c6", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.c6.root", wh.toString)
        val rowsC = spark.range(nc).select(col("id").as("k"), (col("id") % 1000).as("v"))
        spark.sql("CREATE TABLE c6.zm (k BIGINT, v BIGINT) TBLPROPERTIES ('statscol'='k')")
        spark.sql("CREATE TABLE c6.plain (k BIGINT, v BIGINT)")
        timed("insert 6M range-clustered (64 files, zone maps)")(
          rowsC.repartitionByRange(64, col("k")).writeTo("c6.zm").append())
        timed("insert 6M range-clustered (64 files, NO stats)")(
          rowsC.repartitionByRange(64, col("k")).writeTo("c6.plain").append())
        val slabLo = nc / 2
        val slabHi = nc / 2 + nc / 64 - 1 // ~1 file's key range
        def filesOf(t: String, n: Int) =
          etl.Snapshots.manifest(wh.resolve(t), n)
        timed(s"UPDATE via zone maps (slab of ${nc / 64} keys)")(
          spark.sql(s"UPDATE c6.zm SET v = v + 1000000 WHERE k BETWEEN $slabLo AND $slabHi"))
        val zmBefore = filesOf("zm", 1).map(e => e.relPath -> e.md5).toMap
        val zmAfter = filesOf("zm", 2)
        val zmCarried = zmAfter.count(e => zmBefore.get(e.relPath).contains(e.md5))
        val zmFresh = zmAfter.size - zmCarried
        val zmTotalB = zmAfter.map(_.bytes).sum
        val zmFreshB = zmAfter.filterNot(e => zmBefore.get(e.relPath).contains(e.md5))
          .map(_.bytes).sum
        println(s"[stress] catalog_6m zone-mapped UPDATE: rewrote $zmFresh of 64 files " +
          f"(${zmFreshB / 1e6}%.1f of ${zmTotalB / 1e6}%.1f MB written = " +
          f"${100.0 * zmFreshB / zmTotalB}%.1f%%), carried $zmCarried byte-identical")
        assert(zmFresh <= 3, s"zone-mapped UPDATE rewrote $zmFresh files; expected <=3")
        timed("UPDATE without zone maps (same slab, full rewrite)")(
          spark.sql(s"UPDATE c6.plain SET v = v + 1000000 WHERE k BETWEEN $slabLo AND $slabHi"))
        val plBefore = filesOf("plain", 1).map(e => e.relPath -> e.md5).toMap
        val plAfter = filesOf("plain", 2)
        val plCarried = plAfter.count(e => plBefore.get(e.relPath).contains(e.md5))
        println(s"[stress] catalog_6m stats-less UPDATE: replaced ALL 64 files with " +
          s"${plAfter.size - plCarried} fresh (full ${plAfter.map(_.bytes).sum / 1000000} MB " +
          s"rewrite; carried $plCarried)")
        // conservation: both tables agree exactly after their updates
        val sZm = spark.sql("SELECT count(*) c, sum(v) sv FROM c6.zm").head
        val sPl = spark.sql("SELECT count(*) c, sum(v) sv FROM c6.plain").head
        assert(sZm.getLong(0) == nc && sZm.toSeq == sPl.toSeq,
          s"update legs diverged: $sZm vs $sPl")
        timed(s"DELETE via zone maps (slab)")(
          spark.sql(s"DELETE FROM c6.zm WHERE k BETWEEN $slabLo AND $slabHi"))
        val delAfter = filesOf("zm", 3)
        val delCarried = delAfter.count(e =>
          zmAfter.exists(b => b.relPath == e.relPath && b.md5 == e.md5))
        println(s"[stress] catalog_6m DELETE: rewrote ${delAfter.size - delCarried} files, " +
          s"carried $delCarried")
        assert(spark.sql("SELECT count(*) FROM c6.zm").head.getLong(0) == nc - (nc / 64),
          "DELETE count drift")
        // time travel still whole after both rewrites
        assert(spark.sql("SELECT count(*) FROM c6.zm VERSION AS OF 1").head.getLong(0) == nc)

      case "source_6m" =>
        // A33 at 6M rows / 64 files: the graft-snapshot DATA SOURCE's
        // plan-time skipping measured as opened-file fractions and
        // wall-clock, against the full scan through the same source.
        // Claims: (1) a pushed range predicate opens ~1/8 of the files
        // for a 1/8 key slab (zone maps fed by Catalyst dataFilters);
        // (2) a bloom point lookup on a HASH layout opens O(1) files of
        // 64; (3) planning is manifest-driven — the slab query plans in
        // milliseconds with zero directory listing; (4) pruning is pure
        // I/O savings: counts equal the full-scan filter's exactly.
        val n6 = 6L * 1000 * 1000
        val rootR = java.nio.file.Files.createTempDirectory("graft_src6r")
        val rootH = java.nio.file.Files.createTempDirectory("graft_src6h")
        val rows6 = spark.range(n6).select(col("id").as("k"), (col("id") % 97).as("g"))
        timed("publish 6M range-clustered (64 files, zone maps)")(
          etl.Snapshots.publish(spark, rootR,
            rows6.repartitionByRange(64, col("k")), statsCol = Some("k")))
        timed("publish 6M hash-layout (64 files) + blooms") {
          etl.Snapshots.publish(spark, rootH, rows6.repartition(64, col("k")))
          etl.Snapshots.buildBlooms(spark, rootH, 1, "k", estItems = 1L << 17)
        }
        def viaSource(root: java.nio.file.Path, extra: (String, String)*) = {
          val r = spark.read.format("graft-snapshot").option("path", root.toString)
          extra.foldLeft(r) { case (acc, (kv)) => acc.option(kv._1, kv._2) }.load()
        }
        def openedFiles(df: org.apache.spark.sql.DataFrame): Long = {
          def find(p: org.apache.spark.sql.execution.SparkPlan): Option[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
            case f: org.apache.spark.sql.execution.FileSourceScanExec => Some(f)
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => find(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
            case other => other.children.view.flatMap(find(_)).headOption
          }
          find(df.queryExecution.executedPlan).get.metrics("numFiles").value
        }
        val tFull0 = System.nanoTime()
        val fullCnt = viaSource(rootR, "statscol" -> "k")
          .filter(col("k") < n6 / 8).count()
        val fullSecs = (System.nanoTime() - tFull0) / 1e9
        // planning cost alone: force the physical plan of a fresh slab query
        val tPlan0 = System.nanoTime()
        val slabDf = viaSource(rootR, "statscol" -> "k").filter(col("k") < n6 / 8)
        slabDf.queryExecution.executedPlan
        println(f"[stress] source_6m slab PLANNING: ${(System.nanoTime() - tPlan0) / 1e6}%.1f ms (manifest-driven, no listing)")
        // metrics must come from the plan that EXECUTED: count() builds
        // its own QueryExecution, so aggregate and inspect the same frame
        val slabAgg = slabDf.groupBy().count()
        val tSlab0 = System.nanoTime()
        val slabCnt = slabAgg.collect().head.getLong(0)
        val slabSecs = (System.nanoTime() - tSlab0) / 1e9
        val slabOpened = openedFiles(slabAgg)
        assert(slabCnt == n6 / 8 && fullCnt == slabCnt,
          s"slab read wrong: $slabCnt vs $fullCnt")
        assert(slabOpened * 4 <= 64, s"zone maps pruned weakly: $slabOpened of 64")
        println(f"[stress] source_6m range slab: $slabOpened/64 files, " +
          f"$slabSecs%.2f s (full source scan + filter: $fullSecs%.2f s)")
        val tPt0 = System.nanoTime()
        val ptDf = viaSource(rootH).filter(col("k") === 4999999L)
        val ptRows = ptDf.collect()
        val ptSecs = (System.nanoTime() - tPt0) / 1e9
        val ptOpened = openedFiles(ptDf)
        assert(ptRows.length == 1 && ptRows.head.getLong(0) == 4999999L)
        assert(ptOpened <= 4, s"blooms pruned weakly: $ptOpened of 64")
        println(f"[stress] source_6m bloom point: $ptOpened/64 files, $ptSecs%.2f s")

      case "mor_6m" =>
        // Merge-on-read vs copy-on-write statement cost at 6M rows / 64
        // files: the SAME slab UPDATE through (a) the SupportsDelta path
        // on a morkey table — one tombstone + one small data file, ZERO
        // base files rewritten — and (b) the group-based CoW path with
        // zone maps — O(affected files) rewritten. Claims: (1) MoR
        // writes orders of magnitude fewer bytes per statement; (2) the
        // MoR read pays a bounded anti-join until CALL compact folds the
        // deltas, after which reads return to the pure scan path;
        // (3) answers are identical across both legs at every step.
        val nm = 6L * 1000 * 1000
        val whM = java.nio.file.Files.createTempDirectory("graft_mor6")
        spark.conf.set("spark.sql.catalog.m6", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.m6.root", whM.toString)
        // realistic row width: a 64-char payload keeps file bytes honest
        // (an all-integer 6M-row table compresses to almost nothing and
        // understates what a CoW file rewrite costs)
        val rowsM = spark.range(nm).select(col("id").as("k"), (col("id") % 1000).as("v"),
          concat(lit("payload-"), col("id"),
            lit("-abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnop")).as("body"))
        spark.sql("CREATE TABLE m6.mor (k BIGINT NOT NULL, v BIGINT, body STRING) " +
          "TBLPROPERTIES ('morkey'='k', 'statscol'='k')")
        spark.sql("CREATE TABLE m6.cow (k BIGINT, v BIGINT, body STRING) " +
          "TBLPROPERTIES ('statscol'='k')")
        timed("insert 6M x2 (64 files each, zone maps)") {
          rowsM.repartitionByRange(64, col("k")).writeTo("m6.mor").append()
          rowsM.repartitionByRange(64, col("k")).writeTo("m6.cow").append()
        }
        val lo = nm / 2
        val hi = nm / 2 + 999 // 1k keys — a 1% FRACTION of one 94k-row file
        def manifestOf(t: String) = etl.Snapshots.manifest(
          whM.resolve(t), etl.Snapshots.currentId(whM.resolve(t)).get)
        val morBase = manifestOf("mor")
        timed(s"MoR UPDATE (1k of 6M keys, delta commit)")(
          spark.sql(s"UPDATE m6.mor SET v = v + 1000000 WHERE k BETWEEN $lo AND $hi"))
        val morAfter = manifestOf("mor")
        val morFresh = morAfter.filterNot(e => morBase.exists(_.relPath == e.relPath))
        val morFreshB = morFresh.map(_.bytes).sum
        morBase.foreach(b => assert(morAfter.exists(e =>
          e.relPath == b.relPath && e.md5 == b.md5 && e.seq == b.seq),
          s"MoR UPDATE rewrote base file ${b.relPath}"))
        timed(s"CoW UPDATE (same 1k keys, group rewrite)")(
          spark.sql(s"UPDATE m6.cow SET v = v + 1000000 WHERE k BETWEEN $lo AND $hi"))
        val cowBase = etl.Snapshots.manifest(whM.resolve("cow"), 1)
        val cowAfter = manifestOf("cow")
        val cowFreshB = cowAfter.filterNot(e =>
          cowBase.exists(b => b.relPath == e.relPath && b.md5 == e.md5)).map(_.bytes).sum
        println(f"[stress] mor_6m statement bytes: MoR wrote ${morFreshB / 1e3}%.1f KB " +
          f"(${morFresh.size} delta files, 0 base rewrites) vs CoW ${cowFreshB / 1e6}%.1f MB")
        assert(morFreshB * 10 < cowFreshB,
          s"MoR delta not an order smaller: $morFreshB vs $cowFreshB")
        val sMor = spark.sql("SELECT count(*) c, sum(v) sv FROM m6.mor").head
        val sCow = spark.sql("SELECT count(*) c, sum(v) sv FROM m6.cow").head
        assert(sMor.getLong(0) == nm && sMor.toSeq == sCow.toSeq,
          s"MoR/CoW legs diverged: $sMor vs $sCow")
        // read price: merged (anti-join) read vs pure, then compaction
        // folds the delta and the fast path returns
        val tMerged0 = System.nanoTime()
        spark.sql("SELECT sum(v) FROM m6.mor").head
        val mergedSecs = (System.nanoTime() - tMerged0) / 1e9
        timed("CALL compact folds the delta")(
          spark.sql("CALL m6.system.compact('mor', 64)"))
        assert(!manifestOf("mor").exists(etl.Snapshots.isDelete),
          "compact left tombstones")
        val tPure0 = System.nanoTime()
        val sFolded = spark.sql("SELECT count(*) c, sum(v) sv FROM m6.mor").head
        val pureSecs = (System.nanoTime() - tPure0) / 1e9
        assert(sFolded.toSeq == sCow.toSeq, "compaction changed answers")
        println(f"[stress] mor_6m read: merged ${mergedSecs}%.2f s -> " +
          f"post-compact ${pureSecs}%.2f s; answers identical throughout")

      case "bloom_1k" =>
        // buildBlooms at 1,000 files: sidecars are written EXECUTOR-side
        // (one aggregated row per file lands from the task that holds
        // it) — the r12 implementation collected every filter's bytes to
        // the driver, a guaranteed OOM at a million-file backfill.
        // Claims: (1) 1,000 sidecars built in one job; (2) driver heap
        // growth stays a small fraction of the total sidecar bytes;
        // (3) point reads through the fresh sidecars stay exact.
        val nb = 2L * 1000 * 1000
        val rootB = java.nio.file.Files.createTempDirectory("graft_bloom1k")
        timed("publish 2M rows across 1,000 hash files")(
          etl.Snapshots.publish(spark, rootB,
            spark.range(nb).select(col("id").as("k"), (col("id") % 97).as("g"))
              .repartition(1000, col("k"))))
        assert(etl.Snapshots.manifest(rootB, 1).size == 1000)
        def heapUsed(): Long = {
          System.gc(); Thread.sleep(200); System.gc()
          Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
        }
        val heap0 = heapUsed()
        timed("buildBlooms over 1,000 files (executor-side sidecars)") {
          val built = etl.Snapshots.buildBlooms(spark, rootB, 1, "k",
            estItems = 1L << 12, numBits = 1L << 20)
          assert(built == 1000, s"built $built of 1000")
        }
        val heapDelta = heapUsed() - heap0
        val sidecarBytes = {
          val walk = java.nio.file.Files.walk(rootB.resolve("blooms"))
          try {
            import scala.collection.JavaConverters._
            walk.iterator().asScala.filter(p =>
              p.getFileName.toString.endsWith(".bloom"))
              .map(java.nio.file.Files.size).sum
          } finally walk.close()
        }
        println(f"[stress] bloom_1k: ${sidecarBytes / 1e6}%.1f MB of sidecars, " +
          f"driver heap delta ${heapDelta / 1e6}%.1f MB " +
          f"(${100.0 * heapDelta / sidecarBytes}%.1f%% of sidecar bytes)")
        assert(heapDelta < sidecarBytes / 2,
          s"driver heap grew $heapDelta vs $sidecarBytes sidecar bytes — " +
            "the build is funneling filters through the driver again")
        val pt = etl.Snapshots.readPoint(spark, rootB, 1, "k", Seq(1234567L)).collect()
        assert(pt.length == 1 && pt.head.getLong(0) == 1234567L, "point read broke")

      case "tomb_10m" =>
        // a WHOLE-PARTITION PURGE: 10M of 12M keys deleted in one
        // statement. r13 staged every tombstone through coalesce(1) —
        // one task, one core, one file; now the distinct's shuffle
        // output is AQE-size-coalesced, so the purge stages N bounded
        // files from N tasks. Claims: (1) the tombstone staging
        // parallelizes (>1 file at this size, no single-task funnel);
        // (2) the merged read after the purge is exact; (3) the CDF
        // retraction leg of the same window survives without the
        // forced broadcast (the 10M-key window exceeds the 64MB hint
        // threshold or rides AQE either way).
        val nt = 12L * 1000 * 1000
        val rootT = java.nio.file.Files.createTempDirectory("graft_tomb10m")
        val rowsT = spark.range(nt).select(col("id").as("k"), (col("id") % 97).as("v"))
        timed("publish 12M x 64 files")(etl.Snapshots.publish(
          spark, rootT, rowsT.repartitionByRange(64, col("k")), statsCol = Some("k")))
        val keys = spark.range(nt - 2L * 1000 * 1000).select(col("id").as("k"))
        val t0 = System.nanoTime()
        etl.Snapshots.publishDeletes(spark, rootT, keys)
        val delSecs = (System.nanoTime() - t0) / 1e9
        val tombs = etl.Snapshots.manifest(rootT, 2).filter(etl.Snapshots.isDelete)
        println(f"[stress] tomb_10m: 10M-key purge staged ${tombs.size} tombstone " +
          f"file(s), ${tombs.map(_.bytes).sum / 1e6}%.1f MB, in $delSecs%.1f s")
        assert(tombs.size > 1,
          s"10M keys staged through ${tombs.size} file — the single-task funnel is back")
        val after = etl.Snapshots.readCurrent(spark, rootT)
        val cnt = after.count()
        assert(cnt == 2L * 1000 * 1000, s"purge kept $cnt rows, expected 2M")
        val mn = after.agg(min("k")).head.getLong(0)
        assert(mn == nt - 2L * 1000 * 1000, s"wrong survivor floor $mn")
        val tCdf0 = System.nanoTime()
        val feed = etl.Snapshots.readChangeFeed(spark, rootT, 1, 2)
        val dels = feed.filter(col("_change_type") === "delete").count()
        println(f"[stress] tomb_10m CDF retraction leg: $dels%d deletes in " +
          f"${(System.nanoTime() - tCdf0) / 1e9}%.1f s (no forced broadcast)")
        assert(dels == 10L * 1000 * 1000, s"CDF retractions $dels != 10M")

      case "skew_write" =>
        // SKEWED identity-partitioned write: 12M rows over 8 partition
        // values with ONE value holding 80% of them. r15's strict
        // clustering serialized that value through one task (the
        // documented honest edge); the write now declares its
        // clustering PREFERRED (distributionStrictlyRequired = false),
        // so Spark plans a REBALANCE and AQE skew-splits the hot value
        // across tasks while still coalescing the small ones. A/B
        // against the 'writedistribution'='none' V1 partitionBy leg
        // (full parallelism, task x value file explosion). Claims:
        // (1) the hot value lands in >1 file — the split actually
        //     happened, parallelism restored;
        // (2) the clustered file count stays BOUNDED — well under the
        //     V1 leg's task x value shape;
        // (3) wall-clock parity with the V1 leg (the r15 edge was the
        //     serial hot task, not the shuffle);
        // (4) identical answers (count + checksum per partition).
        val nw = 12L * 1000 * 1000
        val rootW = java.nio.file.Files.createTempDirectory("graft_skeww")
        spark.conf.set("spark.sql.catalog.sw", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.sw.root", rootW.toString)
        // provoke real splits at this size: advisory 8MB (default 64MB)
        val prevAdv = spark.conf
          .getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        try {
          def rowsW = spark.range(nw).select(
            when(col("id") % 10 < 8, lit(7L)).otherwise(col("id") % 8).as("p"),
            col("id").as("k"),
            concat(lit("pad-"), col("id")).as("pad"))
          def mk(name: String, props: String): Unit =
            spark.sql(s"CREATE TABLE sw.$name (p BIGINT, k BIGINT, pad STRING) " +
              s"PARTITIONED BY (p) $props")
          // untimed warmup: absorb JVM/codegen/page-cache startup so the
          // first timed leg is not penalized
          mk("warm", "")
          spark.range(100000).select((col("id") % 8).as("p"), col("id").as("k"),
            lit("w").as("pad")).writeTo("sw.warm").append()
          mk("v1", "TBLPROPERTIES ('writedistribution'='none')")
          mk("clu", "")
          val tV0 = System.nanoTime()
          rowsW.repartition(32).writeTo("sw.v1").append()
          val v1S = (System.nanoTime() - tV0) / 1e9
          val tC0 = System.nanoTime()
          rowsW.repartition(32).writeTo("sw.clu").append()
          val cluS = (System.nanoTime() - tC0) / 1e9
          def filesOf(t: String) = etl.Snapshots.manifest(rootW.resolve(t), 1)
          val v1Files = filesOf("v1").size
          val cluFiles = filesOf("clu").size
          val hotFiles = filesOf("clu")
            .count(e => etl.Snapshots.partValueOf(e.relPath).contains("7"))
          println(f"[stress] skew_write 12M rows, 80%% on one value: " +
            f"clustered $cluS%.2f s / $cluFiles files ($hotFiles hot) vs " +
            f"V1 partitionBy $v1S%.2f s / $v1Files files")
          assert(hotFiles > 1,
            s"hot value still serialized through one task ($hotFiles file)")
          assert(cluFiles < v1Files / 2,
            s"clustered write lost the small-files win: $cluFiles vs $v1Files")
          assert(cluS < v1S * 2.0,
            f"clustered write fell behind the V1 leg: $cluS%.2f vs $v1S%.2f s")
          // answers identical partition-by-partition
          val a = spark.sql("SELECT p, count(*) AS n, sum(k) AS s FROM sw.clu GROUP BY 1")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
          val b = spark.sql("SELECT p, count(*) AS n, sum(k) AS s FROM sw.v1 GROUP BY 1")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
          assert(a.sameElements(b), "clustered and V1 legs diverged")
          // UNSORTED bucketed leg: the hot key's bucket skew-splits too
          // (sorted buckets stay strict — the ordering claim needs
          // disjoint per-bucket ranges)
          spark.sql("CREATE TABLE sw.bk (p BIGINT, k BIGINT, pad STRING) " +
            "PARTITIONED BY (bucket(8, p))")
          val tB0 = System.nanoTime()
          rowsW.repartition(32).writeTo("sw.bk").append()
          val bkS = (System.nanoTime() - tB0) / 1e9
          val bkFiles = filesOf("bk")
          val perBucket = bkFiles.groupBy(e =>
            etl.Snapshots.partValueOf(e.relPath)).view.mapValues(_.size).toMap
          val bkHot = perBucket.values.max
          println(f"[stress] skew_write bucketed(8): $bkS%.2f s / " +
            f"${bkFiles.size} files, hot bucket $bkHot files")
          assert(bkHot > 1,
            s"hot bucket still serialized through one task ($bkHot file)")
          assert(spark.sql("SELECT count(*) FROM sw.bk").head.getLong(0) == nw)
        } finally {
          prevAdv match {
            case Some(v) => spark.conf.set(
              "spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
            case None => spark.conf.unset(
              "spark.sql.adaptive.advisoryPartitionSizeInBytes")
          }
        }

      case "stream_backlog_12m" =>
        // A MIRROR THAT FELL BEHIND: 12M rows sitting in a source
        // catalog table as 8 commits, drained by the DSv2 streaming
        // pipe (readStream.table -> writeStream.toTable). Unpaced, the
        // first micro-batch IS the whole backlog — one 12M-row epoch,
        // all-or-nothing on a crash; paced by manifest-proven bytes
        // (maxbytespertrigger), the same backlog drains as bounded
        // AvailableNow epochs. Claims:
        //  (1) pacing engaged: >=4 data batches, every window's
        //      manifest bytes inside the cap (modulo the first-commit
        //      progress allowance);
        //  (2) bounded per-epoch work: the largest paced batch carries
        //      well under half the backlog;
        //  (3) exactly-once at scale: 12M rows in the sink, no
        //      duplicated key, snapshot count == batch count;
        //  (4) paced wall-clock within 2x of the unpaced drain —
        //      pacing buys bounded batches, not a throughput cliff.
        val nb = 12L * 1000 * 1000
        val rootB = java.nio.file.Files.createTempDirectory("graft_backlog")
        spark.conf.set("spark.sql.catalog.bklog", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.bklog.root", rootB.toString)
        spark.sql("CREATE TABLE bklog.src (k BIGINT, pad STRING)")
        (0 until 8).foreach { i =>
          spark.range(i * nb / 8, (i + 1) * nb / 8)
            .select(col("id").as("k"), concat(lit("pad-"), col("id")).as("pad"))
            .writeTo("bklog.src").append()
        }
        val srcStore = rootB.resolve("src")
        val bySeq = etl.Snapshots.manifest(srcStore, 8).groupBy(_.seq)
          .map { case (s0, es) => (s0, es.map(_.bytes).sum) }
        val cap = bySeq.values.max * 2 // ~2 commits per epoch
        def drain(dst: String, paced: Boolean): (Double, Seq[(Int, Int, Long)]) = {
          spark.sql(s"CREATE TABLE bklog.$dst (k BIGINT, pad STRING)")
          val ckpt = java.nio.file.Files.createTempDirectory(s"graft_backlog_$dst")
          val t0 = System.nanoTime()
          val rd = spark.readStream
          val q = (if (paced) rd.option("maxbytespertrigger", cap) else rd)
            .table("bklog.src")
            .writeStream.option("checkpointLocation", ckpt.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable(s"bklog.$dst")
          assert(q.awaitTermination(600000L), s"$dst drain did not terminate")
          val secs = (System.nanoTime() - t0) / 1e9
          val windows = q.recentProgress.toIndexedSeq.filter(_.numInputRows > 0)
            .map { p =>
              (Option(p.sources.head.startOffset).map(_.trim.toInt).getOrElse(0),
                p.sources.head.endOffset.trim.toInt, p.numInputRows)
            }
          (secs, windows)
        }
        // untimed warmup: absorb stream-engine startup
        spark.sql("CREATE TABLE bklog.wsrc (k BIGINT, pad STRING)")
        spark.sql("INSERT INTO bklog.wsrc SELECT id, 'w' FROM range(0, 1000)")
        spark.sql("CREATE TABLE bklog.wdst (k BIGINT, pad STRING)")
        val wq = spark.readStream.table("bklog.wsrc")
          .writeStream.option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft_backlog_w").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("bklog.wdst")
        assert(wq.awaitTermination(600000L))
        val (unpacedS, unpacedW) = drain("all", paced = false)
        val (pacedS, pacedW) = drain("paced", paced = true)
        println(f"[stress] stream_backlog_12m: unpaced $unpacedS%.2f s / " +
          f"${unpacedW.size} batch (max ${unpacedW.map(_._3).max} rows) vs " +
          f"paced $pacedS%.2f s / ${pacedW.size} batches " +
          f"(max ${pacedW.map(_._3).max} rows, cap ${cap / (1 << 20)} MB)")
        assert(unpacedW.size == 1 && unpacedW.head._3 == nb,
          s"unpaced drain must be one 12M-row epoch, saw $unpacedW")
        assert(pacedW.size >= 4, s"pacing did not engage: $pacedW")
        pacedW.foreach { case (a, b, _) =>
          val wBytes = bySeq.filter { case (s0, _) => s0 > a && s0 <= b }.values.sum
          // windows past the first commit obey the cap exactly; a
          // single over-cap commit may stand alone (progress guarantee)
          assert(b - a == 1 || wBytes <= cap,
            s"window ($a,$b] carries $wBytes bytes over the $cap cap")
        }
        assert(pacedW.map(_._3).max <= nb / 2,
          "a paced epoch carried over half the backlog")
        val dstStore = rootB.resolve("paced")
        assert(etl.Snapshots.currentId(dstStore).contains(pacedW.size),
          "sink snapshot count != paced batch count")
        assert(spark.sql("SELECT count(*) FROM bklog.paced").head.getLong(0) == nb)
        assert(spark.sql(
          "SELECT max(c) FROM (SELECT count(*) c FROM bklog.paced GROUP BY k)")
          .head.getLong(0) == 1L, "duplicated key in the paced sink")
        assert(pacedS < unpacedS * 2.0,
          f"paced drain fell off a cliff: $pacedS%.2f vs $unpacedS%.2f s")

      case "statements_sf1" =>
        // The statement-path family priced at sf1 (10x the bench gate),
        // where I/O fractions rather than fixed job startup should
        // dominate: CoW UPDATE vs MoR UPDATE at three slab sizes (the
        // crossover), the mirror-sync MERGE, dynamic partition
        // overwrite, and the merged-vs-compacted read. Uses the
        // UpscaleTestdata sf1 dir (1.5M orders, FK-consistent).
        val sf1 = "/root/repo/scratch/sf1f"
        require(new java.io.File(s"$sf1/orders.parquet").exists,
          s"run UpscaleTestdata first: no $sf1")
        val whS = java.nio.file.Files.createTempDirectory("graft_stmt1")
        spark.conf.set("spark.sql.catalog.s1", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.s1.root", whS.toString)
        val ordS = spark.read.parquet(s"$sf1/orders.parquet")
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100).cast("long").as("cents"),
            (col("o_orderkey") % 8).as("p"))
        val nOrd = ordS.count()
        def mkTable(name: String, props: String): Unit = {
          spark.sql(s"CREATE TABLE s1.$name (k BIGINT NOT NULL, st STRING, " +
            s"cents BIGINT, p BIGINT) $props")
          ordS.repartitionByRange(64, col("k")).writeTo(s"s1.$name").append()
        }
        timed(s"insert $nOrd orders x3 (cow, mor, part)") {
          mkTable("cow", "TBLPROPERTIES ('statscol'='k')")
          mkTable("mor", "TBLPROPERTIES ('morkey'='k', 'statscol'='k')")
          spark.sql("CREATE TABLE s1.part (k BIGINT NOT NULL, st STRING, " +
            "cents BIGINT, p BIGINT) PARTITIONED BY (p) " +
            "TBLPROPERTIES ('morkey'='k', 'statscol'='k')")
          ordS.writeTo("s1.part").append()
        }
        def bytesOf(t: String, prior: Set[String]): Long = {
          val store = whS.resolve(t)
          etl.Snapshots.manifest(store, etl.Snapshots.currentId(store).get)
            .filterNot(e => prior(e.relPath)).map(_.bytes).sum
        }
        def relSet(t: String): Set[String] = {
          val store = whS.resolve(t)
          etl.Snapshots.manifest(store, etl.Snapshots.currentId(store).get)
            .map(_.relPath).toSet
        }
        // CoW vs MoR UPDATE crossover at 1k / 10k / 100k-key slabs
        // (clustered: zone maps bound the CoW rewrite to the slab files)
        for (slab <- Seq(1000L, 10000L, 100000L)) {
          // replica-0 keys are 1..600000 (every ~4th); start mid-domain
          val lo = 100000L
          val hi = lo + slab * 4 // x4 spacing => ~slab matched keys
          for (t <- Seq("cow", "mor")) {
            val prior = relSet(t)
            val t0 = System.nanoTime()
            spark.sql(s"UPDATE s1.$t SET cents = cents + 1 WHERE k BETWEEN $lo AND $hi")
            val secs = (System.nanoTime() - t0) / 1e9
            println(f"[stress] statements_sf1 UPDATE $t%-3s slab=$slab%7d: " +
              f"$secs%5.2f s, ${bytesOf(t, prior) / 1e6}%7.2f MB written")
          }
        }
        // the crossover leg: a SCATTERED update (every file holds matches)
        // — CoW must rewrite O(all files), MoR still writes O(changed)
        for (t <- Seq("cow", "mor")) {
          val prior = relSet(t)
          val t0 = System.nanoTime()
          spark.sql(s"UPDATE s1.$t SET cents = cents + 1 WHERE k % 6000 = 7")
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"[stress] statements_sf1 UPDATE $t%-3s SCATTERED (~1k keys, all files): " +
            f"$secs%5.2f s, ${bytesOf(t, prior) / 1e6}%7.2f MB written")
        }
        // merged read price after the four MoR updates, then compact
        val tR0 = System.nanoTime()
        val morSum = spark.sql("SELECT sum(cents) FROM s1.mor").head.getLong(0)
        val mergedS = (System.nanoTime() - tR0) / 1e9
        timed("CALL compact folds s1.mor")(
          spark.sql("CALL s1.system.compact('mor', 64)"))
        val tR1 = System.nanoTime()
        val morSum2 = spark.sql("SELECT sum(cents) FROM s1.mor").head.getLong(0)
        val pureS = (System.nanoTime() - tR1) / 1e9
        assert(morSum == morSum2, "compaction changed answers")
        val cowSum = spark.sql("SELECT sum(cents) FROM s1.cow").head.getLong(0)
        assert(morSum == cowSum, s"CoW/MoR legs diverged: $cowSum vs $morSum")
        println(f"[stress] statements_sf1 read: merged $mergedS%.2f s -> " +
          f"post-compact $pureS%.2f s")
        // mirror sync: 1% updates, 0.5% deletes, 0.5% inserts in ONE MERGE
        spark.sql("SELECT * FROM s1.mor").createOrReplaceTempView("cur_mirror")
        spark.sql(s"""
          SELECT k, st, CASE WHEN k % 100 = 7 THEN cents * 2 ELSE cents END AS cents, p
          FROM cur_mirror WHERE k % 200 != 11
          UNION ALL
          SELECT k + 10000000000, 'N', CAST(42 AS BIGINT), k % 8 FROM cur_mirror WHERE k % 200 = 12
        """).createOrReplaceTempView("src_mirror")
        val priorSync = relSet("mor")
        // materialize the source count BEFORE the merge: src_mirror is a
        // lazy view over the TARGET, so a post-merge count would
        // re-evaluate against the post-merge state
        val srcN = spark.table("src_mirror").count()
        val tS0 = System.nanoTime()
        spark.sql("""
          MERGE INTO s1.mor t USING src_mirror s ON t.k = s.k
          WHEN MATCHED AND t.cents != s.cents THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE THEN DELETE""")
        val syncS = (System.nanoTime() - tS0) / 1e9
        println(f"[stress] statements_sf1 mirror sync (1%% upd, 0.5%% del, 0.5%% ins): " +
          f"$syncS%.2f s, ${bytesOf("mor", priorSync) / 1e6}%.2f MB delta")
        assert(spark.sql("SELECT count(*) FROM s1.mor").head.getLong(0) == srcN,
          "sync did not converge to the source")
        // dynamic partition overwrite: replace 1 of 8 partitions
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val priorOw = relSet("part")
        val tO0 = System.nanoTime()
        spark.sql("INSERT OVERWRITE s1.part " +
          "SELECT k, 'OW', cents, 3L FROM s1.cow WHERE p = 3")
        val owS = (System.nanoTime() - tO0) / 1e9
        println(f"[stress] statements_sf1 dynamic overwrite (1 of 8 partitions): " +
          f"$owS%.2f s, ${bytesOf("part", priorOw) / 1e6}%.2f MB written")
        assert(spark.sql("SELECT count(*) FROM s1.part WHERE st = 'OW'").head.getLong(0)
          == spark.sql("SELECT count(*) FROM s1.cow WHERE p = 3").head.getLong(0))

      case "pos_12m" =>
        // POSITION deletes at 12M rows / 64 files on a KEY-LESS table:
        // (1) a clustered DELETE names one file's coordinates and the
        // merged read anti-joins ONLY that file; (2) a scattered DELETE
        // names every file (the honest worst case — all legs join);
        // (3) the CDF retraction leg replays both windows exactly;
        // (4) compact folds the pairs. Claims: pair staging is
        // O(matched rows), zero rewrites, and the clear/hot split keeps
        // clustered deletes near pure-scan read cost.
        val np = 12L * 1000 * 1000
        val rootP = java.nio.file.Files.createTempDirectory("graft_pos12m")
        spark.conf.set("spark.sql.catalog.p12", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.p12.root", rootP.toString)
        spark.sql("CREATE TABLE p12.t (v BIGINT, w BIGINT) " +
          "TBLPROPERTIES ('mordelete'='position', 'statscol'='v')")
        timed("insert 12M x 64 files")(
          spark.range(np).select((col("id") % 1000).as("v"), col("id").as("w"))
            .repartitionByRange(64, col("w")).writeTo("p12.t").append())
        val storeP = rootP.resolve("t")
        def freshPos(prior: Set[String]) = etl.Snapshots
          .manifest(storeP, etl.Snapshots.currentId(storeP).get)
          .filterNot(e => prior(e.relPath))
        // clustered: one file's slab (w range) — duplicate v values, so
        // no equality key could address these rows
        val prior1 = etl.Snapshots.manifest(storeP, 1).map(_.relPath).toSet
        timed("clustered DELETE (~90k rows, 1 file)")(
          spark.sql("DELETE FROM p12.t WHERE w BETWEEN 6000000 AND 6090000 AND v < 500"))
        val f1 = freshPos(prior1)
        println(f"[stress] pos_12m clustered: ${f1.size} pair file(s), " +
          f"${f1.map(_.bytes).sum / 1e3}%.1f KB")
        assert(f1.forall(etl.Snapshots.isPosDelete))
        val t1 = System.nanoTime()
        val c1 = spark.sql("SELECT count(*) FROM p12.t").head.getLong(0)
        println(f"[stress] pos_12m merged read (1 hot file): " +
          f"${(System.nanoTime() - t1) / 1e9}%.2f s")
        // scattered: every file holds matches
        val prior2 = etl.Snapshots.manifest(storeP,
          etl.Snapshots.currentId(storeP).get).map(_.relPath).toSet
        // the predicate must TRANSLATE to pushed filters: an arbitrary
        // expression (w % k = c) cannot reach deleteWhere and the group
        // rewrite refuses on live pairs by design (compact first)
        timed("scattered DELETE (12k rows, all files hold matches)")(
          spark.sql("DELETE FROM p12.t WHERE v = 77"))
        val f2 = freshPos(prior2)
        println(f"[stress] pos_12m scattered: ${f2.size} pair file(s), " +
          f"${f2.map(_.bytes).sum / 1e3}%.1f KB")
        val t2 = System.nanoTime()
        val c2 = spark.sql("SELECT count(*) FROM p12.t").head.getLong(0)
        println(f"[stress] pos_12m merged read (all files hot): " +
          f"${(System.nanoTime() - t2) / 1e9}%.2f s")
        val expected1 = np - spark.range(np)
          .filter(col("id").between(6000000, 6090000) && col("id") % 1000 < 500)
          .count()
        assert(c1 == expected1, s"clustered delete: $c1 != $expected1")
        val expected2 = c1 - spark.range(np).filter(col("id") % 1000 === 77)
          .filter(!(col("id").between(6000000, 6090000) && col("id") % 1000 < 500))
          .count()
        assert(c2 == expected2, s"scattered delete: $c2 != $expected2")
        // CDF over both windows
        val tC = System.nanoTime()
        val feed = etl.Snapshots.readChangeFeed(spark, storeP, 1, 3)
        val nDel = feed.filter(col("_change_type") === "delete").count()
        println(f"[stress] pos_12m CDF (1,3]: $nDel retractions in " +
          f"${(System.nanoTime() - tC) / 1e9}%.2f s")
        assert(nDel == np - c2, s"CDF retractions $nDel != ${np - c2}")
        // an UNTRANSLATABLE predicate routes through the GROUP REWRITE,
        // which serves kept groups MERGED: works on live pairs, CoW cost,
        // zero resurrections
        val preCnt = spark.sql("SELECT count(*) FROM p12.t").head.getLong(0)
        val tU = System.nanoTime()
        spark.sql("DELETE FROM p12.t WHERE w % 6007 = 3")
        println(f"[stress] pos_12m untranslatable DELETE (group rewrite over live pairs): " +
          f"${(System.nanoTime() - tU) / 1e9}%.2f s")
        val cntU = spark.sql("SELECT count(*) FROM p12.t").head.getLong(0)
        val expU = preCnt - spark.range(np).filter(col("id") % 6007 === 3)
          .filter(!(col("id").between(6000000, 6090000) && col("id") % 1000 < 500))
          .filter(!(col("id") % 1000 === 77)).count()
        assert(cntU == expU, s"untranslatable delete: $cntU != $expU (resurrection?)")
        // EXECUTOR-SIDE bitmap merge A/B: force the distributed path
        // (threshold 0) on the same live tombstone set and re-run the
        // merged read — identical answer, wall-clock priced against the
        // memoized driver fold. At production the dial only flips above
        // 64 MB of compressed tombstones; the A/B proves the path at
        // real row scale without fabricating billions of ordinals.
        val tD = System.nanoTime()
        spark.conf.set("spark.graft.posBitmapMerge.maxDriverBytes", "0")
        val cD = try spark.sql("SELECT count(*) FROM p12.t").head.getLong(0)
          finally spark.conf.unset("spark.graft.posBitmapMerge.maxDriverBytes")
        println(f"[stress] pos_12m merged read via EXECUTOR-side bitmap merge: " +
          f"${(System.nanoTime() - tD) / 1e9}%.2f s (driver-fold read above)")
        assert(cD == cntU, s"distributed bitmap merge diverged: $cD != $cntU")
        timed("compact folds the pairs")(spark.sql("CALL p12.system.compact('t', 64)"))
        val t3 = System.nanoTime()
        assert(spark.sql("SELECT count(*) FROM p12.t").head.getLong(0)
          == spark.range(np)
            .filter(!(col("id").between(6000000, 6090000) && col("id") % 1000 < 500))
            .filter(!(col("id") % 1000 === 77))
            .filter(!(col("id") % 6007 === 3)).count())
        println(f"[stress] pos_12m post-compact read: " +
          f"${(System.nanoTime() - t3) / 1e9}%.2f s")

      case "spj_dpp_12m" =>
        // The two new DSv2 scan capabilities priced at 12M rows:
        // (1) RUNTIME FILE PRUNING (DPP) — a selective dim join prunes
        // a 32-partition fact to its 2 matching files at RUN time; A/B
        // vs the same join with dynamic pruning disabled prices the
        // skipped I/O. (2) STORAGE-PARTITIONED JOIN — the co-partitioned
        // fact-to-shard-summary join with v2 bucketing on runs with
        // ZERO exchanges; A/B vs bucketing off prices the eliminated
        // 12M-row shuffle. Claims asserted, not just timed: the runtime
        // filter kept < total files; the SPJ plan has 0 shuffle nodes
        // while the off leg has > 0; all four legs agree exactly.
        val nf = 12L * 1000 * 1000
        val whJ = java.nio.file.Files.createTempDirectory("graft_spj12")
        spark.conf.set("spark.sql.catalog.j12", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.j12.root", whJ.toString)
        spark.sql("CREATE TABLE j12.fact (shard BIGINT, v BIGINT) PARTITIONED BY (shard)")
        spark.sql("CREATE TABLE j12.summ (shard BIGINT, w BIGINT) PARTITIONED BY (shard)")
        timed("insert 12M x 32 shards")(
          spark.range(nf).select((col("id") % 32).as("shard"), col("id").as("v"))
            .repartition(32, col("shard")).writeTo("j12.fact").append())
        spark.range(nf).select((col("id") % 32).as("shard"), (col("id") * 2).as("w"))
          .groupBy("shard").agg(sum("w").as("w")).writeTo("j12.summ").append()
        val dimJ = spark.range(0, 32).select(col("id").as("k"), (col("id") % 16).as("grp"))
          .filter(col("grp") === 0) // keeps shards {0, 16}
        def dppLeg(enabled: Boolean): (Long, Double, Int, Int) = {
          spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
            enabled.toString)
          graft.sources.GraftScan.resetRuntimePrune(whJ.resolve("fact"))
          val t0 = System.nanoTime()
          val r = spark.table("j12.fact").join(dimJ, col("shard") === col("k"))
            .agg(sum("v")).head.getLong(0)
          val secs = (System.nanoTime() - t0) / 1e9
          val (kept, ttl) =
            graft.sources.GraftScan.lastRuntimePruneFor(whJ.resolve("fact"))
          (r, secs, kept, ttl)
        }
        dppLeg(enabled = true) // warm page cache + codegen before timing
        val (rOn, sOn, keptOn, ttlOn) = dppLeg(enabled = true)
        val (rOff, sOff, _, _) = dppLeg(enabled = false)
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.enabled")
        println(f"[stress] spj_dpp_12m DPP: runtime prune kept $keptOn of $ttlOn files; " +
          f"join $sOn%.2f s with pruning vs $sOff%.2f s without (answers equal: ${rOn == rOff})")
        assert(rOn == rOff, s"DPP changed the answer: $rOn vs $rOff")
        assert(ttlOn > 0 && keptOn < ttlOn,
          s"runtime filter pruned nothing: kept $keptOn of $ttlOn")
        def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
          val kids = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
            case o => o.children
          }
          (p match {
            case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
            case _ => 0
          }) + kids.map(countShuffles).sum
        }
        val prevBcJ = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        def spjLeg(enabled: Boolean): (Seq[(Long, Long)], Double, Int) = {
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", enabled.toString)
          val t0 = System.nanoTime()
          val df = spark.table("j12.fact").join(spark.table("j12.summ"), "shard")
            .groupBy("shard").agg(sum(col("v") + col("w")).as("s"))
          val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
          (rows, (System.nanoTime() - t0) / 1e9,
            countShuffles(df.queryExecution.executedPlan))
        }
        spjLeg(enabled = false) // warm
        val (rowsOff, tOff, shOff) = spjLeg(enabled = false)
        val (rowsOn, tOn, shOn) = spjLeg(enabled = true)
        println(f"[stress] spj_dpp_12m SPJ: $tOn%.2f s / $shOn shuffles with v2 bucketing " +
          f"vs $tOff%.2f s / $shOff shuffles without (answers equal: ${rowsOn == rowsOff})")
        assert(rowsOn == rowsOff, "SPJ changed the answer")
        assert(shOn == 0, s"SPJ leg still shuffled ($shOn exchanges)")
        assert(shOff > 0, "the A/B baseline lost its shuffle — comparison is void")
        // the BUCKET leg: two 12M-row tables joined on a 12M-cardinality
        // key — the join identity partitioning cannot co-locate (12M
        // dirs). bucket(32, k) both sides; the join + per-key aggregate
        // run exchange-free, only the final global fold shuffles (1
        // single-partition exchange in BOTH legs — the A/B difference is
        // the two 12M-row join exchanges).
        spark.sql("CREATE TABLE j12.fb (k BIGINT, v BIGINT) PARTITIONED BY (bucket(32, k))")
        spark.sql("CREATE TABLE j12.sb (k BIGINT, w BIGINT) PARTITIONED BY (bucket(32, k))")
        timed("insert 2 x 12M bucketed (32 buckets)") {
          spark.range(nf).select(col("id").as("k"), (col("id") % 97).as("v"))
            .writeTo("j12.fb").append()
          spark.range(nf).select(col("id").as("k"), (col("id") % 89).as("w"))
            .writeTo("j12.sb").append()
        }
        def bktLeg(enabled: Boolean): (Long, Double, Int) = {
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", enabled.toString)
          val t0 = System.nanoTime()
          val df = spark.table("j12.fb").join(spark.table("j12.sb"), "k")
            .groupBy("k").agg(sum(col("v") + col("w")).as("s"))
            .agg(sum("s").as("chk"))
          val chk = df.head.getLong(0)
          (chk, (System.nanoTime() - t0) / 1e9,
            countShuffles(df.queryExecution.executedPlan))
        }
        bktLeg(enabled = true) // warm
        val (chkOn, btOn, bshOn) = bktLeg(enabled = true)
        val (chkOff, btOff, bshOff) = bktLeg(enabled = false)
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcJ)
        println(f"[stress] spj_dpp_12m BUCKET (12M x 12M on a 12M-cardinality key): " +
          f"$btOn%.2f s / $bshOn shuffles bucketed vs $btOff%.2f s / $bshOff " +
          f"shuffles without (answers equal: ${chkOn == chkOff})")
        assert(chkOn == chkOff, "bucketed join changed the answer")
        assert(bshOn == 1, s"bucketed leg expected ONLY the global fold's exchange, got $bshOn")
        assert(bshOff > bshOn, "baseline lost its join shuffles — comparison void")
        // the SORTED leg: same shape, tables also 'sortcol'-sorted — the
        // merge join elides its two 12M-row SORTS as well (the bucketed-
        // only leg still sorts both sides inside each key group). A/B =
        // what the sorted layout buys ON TOP of co-location.
        def countSorts(p: org.apache.spark.sql.execution.SparkPlan): Int = {
          val kids = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
            case o => o.children
          }
          (p match {
            case _: org.apache.spark.sql.execution.SortExec => 1
            case _ => 0
          }) + kids.map(countSorts).sum
        }
        spark.sql("CREATE TABLE j12.fs (k BIGINT NOT NULL, v BIGINT) " +
          "PARTITIONED BY (bucket(32, k)) TBLPROPERTIES ('sortcol'='k')")
        spark.sql("CREATE TABLE j12.ss (k BIGINT NOT NULL, w BIGINT) " +
          "PARTITIONED BY (bucket(32, k)) TBLPROPERTIES ('sortcol'='k')")
        timed("insert 2 x 12M bucketed SORTED") {
          spark.range(nf).select(col("id").as("k"), (col("id") % 97).as("v"))
            .writeTo("j12.fs").append()
          spark.range(nf).select(col("id").as("k"), (col("id") % 89).as("w"))
            .writeTo("j12.ss").append()
        }
        def sortedLeg(a: String, b: String): (Long, Double, Int, Int) = {
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          val t0 = System.nanoTime()
          val df = spark.table(a).join(spark.table(b), "k")
            .groupBy("k").agg(sum(col("v") + col("w")).as("s"))
            .agg(sum("s").as("chk"))
          val chk = df.head.getLong(0)
          val plan = df.queryExecution.executedPlan
          (chk, (System.nanoTime() - t0) / 1e9, countShuffles(plan), countSorts(plan))
        }
        sortedLeg("j12.fs", "j12.ss") // warm
        val (sChk, sT, sSh, sSo) = sortedLeg("j12.fs", "j12.ss")
        val (uChk, uT, _, uSo) = sortedLeg("j12.fb", "j12.sb")
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcJ)
        println(f"[stress] spj_dpp_12m SORTED: $sT%.2f s / $sSo sorts sorted-bucketed " +
          f"vs $uT%.2f s / $uSo sorts bucketed-only (answers equal: ${sChk == uChk})")
        assert(sChk == uChk, "sorted join changed the answer")
        assert(sSh == 1 && sSo == 0,
          s"sorted leg expected 1 exchange / 0 sorts, got $sSh / $sSo")
        assert(uSo > 0, "bucketed-only baseline lost its sorts — comparison void")

      case "spj_skew_12m" =>
        // the skew story at 12M rows: 10M of 12M rows share ONE key, so
        // one bucket holds ~10M rows. Plain key-grouped execution runs
        // that bucket as ONE task (co-location's skew tax); with
        // partially-clustered distribution the scan's size-bounded
        // chunks stay separate tasks and the hot bucket parallelizes.
        // A/B priced, answers asserted equal.
        val ns = 12L * 1000 * 1000
        val whK = java.nio.file.Files.createTempDirectory("graft_skew12")
        spark.conf.set("spark.sql.catalog.k12", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.k12.root", whK.toString)
        spark.sql("CREATE TABLE k12.hot (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
        spark.sql("CREATE TABLE k12.dim (k BIGINT, w BIGINT) PARTITIONED BY (bucket(8, k))")
        timed("insert 12M skewed (10M on one key)") {
          spark.range(ns).select(
            when(col("id") < 10L * 1000 * 1000, lit(1L))
              .otherwise(col("id") % 100000).as("k"),
            col("id").as("v"))
            .repartition(16).writeTo("k12.hot").append()
        }
        spark.range(0, 100000).select(col("id").as("k"), (col("id") * 5).as("w"))
          .writeTo("k12.dim").append()
        def skewLeg(partiallyClustered: Boolean): (Long, Double) = {
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          // a 4 MB split budget emulates the shape that matters: at
          // 100 TB a hot bucket is many chunks of the default 128 MB —
          // here the whole bucket compresses under one default chunk
          // and there would be nothing to parallelize. Same budget in
          // BOTH legs (the grouped leg merges chunks regardless).
          spark.conf.set("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
          spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
            partiallyClustered.toString)
          spark.conf.set(
            "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
            partiallyClustered.toString)
          val t0 = System.nanoTime()
          val chk = spark.table("k12.hot").join(spark.table("k12.dim"), "k")
            .agg(sum(col("v") + col("w")).as("chk")).head.getLong(0)
          (chk, (System.nanoTime() - t0) / 1e9)
        }
        skewLeg(partiallyClustered = true) // warm
        val (cOn, tOn2) = skewLeg(partiallyClustered = true)
        val (cOff, tOff2) = skewLeg(partiallyClustered = false)
        Seq("spark.sql.sources.v2.bucketing.enabled",
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
          "spark.sql.files.maxPartitionBytes")
          .foreach(spark.conf.unset)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
        println(f"[stress] spj_skew_12m: hot-bucket join $tOn2%.2f s partially-clustered " +
          f"vs $tOff2%.2f s grouped-one-task (answers equal: ${cOn == cOff})")
        assert(cOn == cOff, "partially-clustered skew join changed the answer")
        assert(tOn2 < tOff2,
          f"partially-clustered brought no skew relief: $tOn2%.2f vs $tOff2%.2f")

      case other => sys.error(s"unknown stress scenario: $other")
    }
    spark.stop()
  }
}

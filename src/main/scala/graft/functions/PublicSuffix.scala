package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `psl_registered_domain(host)` — registered (pay-level) domain of a
  * hostname under the Public Suffix List algorithm
  * (publicsuffix.org/list — the rule semantics Mozilla published and
  * every cookie/crawl stack implements):
  *
  *   1. lowercase the host; a host that is empty, has a leading or
  *      trailing dot, or an empty label is invalid → NULL;
  *   2. find every rule matching a trailing label sequence of the
  *      host. Rule kinds: NORMAL (`co.uk` — matches exactly its
  *      labels), WILDCARD (`*.ck` — matches its labels plus ONE more,
  *      only when the host actually has that extra label), EXCEPTION
  *      (`!www.ck` — matches its labels; prevails over everything and
  *      makes the public suffix one label SHORTER than the rule);
  *   3. if an exception rule matched, the public suffix length is
  *      rule-labels − 1; otherwise it is the LONGEST match, with the
  *      implicit `*` default (length 1) when nothing matched;
  *   4. registered domain = public suffix + one label; a host that IS
  *      a public suffix (or shorter) has none → NULL.
  *
  * The embedded rule table is a curated subset of the PSL — every
  * rule that changes behavior versus the `*` default for common
  * crawl traffic (multi-part ccTLD registries, the US state/k12
  * matrix, wildcard ccTLDs with their exceptions, major
  * platform-host private suffixes), plus the rules exercised by the
  * PSL's own published test vectors (kobe.jp / ck / kyoto.jp / us /
  * uk.com). Single-label normal rules (`com`, `biz`, …) are
  * deliberately absent: they decide exactly like the `*` default, so
  * only multi-label, wildcard, and exception rules are data. A
  * production deployment swaps [[PublicSuffixData.rules]] for the
  * full PSL data file through this same lookup path.
  *
  * Scale shape: one O(labels) walk per row against a driver-built
  * hash table shipped as a codegen reference object — a pure
  * projection that rides the scan; no join, no shuffle, unlike the
  * broadcast-suffix-table formulation whose per-doc aggregate would
  * re-shuffle the corpus.
  */
case class PslRegisteredDomain(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "psl_registered_domain"

  override def nullSafeEval(input: Any): Any =
    PublicSuffixData.registeredDomainUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nonNull = nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PublicSuffixData.registeredDomainUtf8($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
    nonNull
  }

  override protected def withNewChildInternal(newChild: Expression): PslRegisteredDomain =
    copy(child = newChild)
}

object PublicSuffixData {

  /** Rule-kind bitmask values (a suffix can carry several kinds). */
  final val Normal = 1
  final val Wildcard = 2
  final val Exception = 4

  private val usStates = Seq(
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy")

  /** NORMAL multi-label public suffixes (ICANN registries + the
    * highest-traffic private platform suffixes). */
  val NormalSuffixes: Seq[String] = Seq(
    // UK
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // AU
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // JP (categories + the test-vector geo rules)
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp", "kyoto.jp", "ide.kyoto.jp", "tokyo.jp", "osaka.jp",
    "hokkaido.jp", "nagoya.jp", "yokohama.jp",
    // BR / CN / IN / NZ / ZA / KR / MX / AR
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "gov.in",
    "ac.in", "edu.in", "res.in", "nic.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr", "seoul.kr",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    // SG / HK / TW / TR / IL / UA / PL / TH / ID / MY / PH / VN / EG / SA
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr", "gen.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "idf.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "info.pl", "biz.pl",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "sch.id", "web.id", "my.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "sch.sa",
    // US state matrix (state, plus k12/cc/lib under each)
    // generated below
    // private-section centralized-registry domains
    "uk.com", "us.com", "eu.com", "gb.net", "se.net", "uk.net", "za.com",
    "br.com", "cn.com", "de.com", "jpn.com", "hu.com", "no.com", "qc.com",
    "ru.com", "sa.com", "uy.com",
    // platform hosting suffixes (private section)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "appspot.com", "firebaseapp.com",
    "azurewebsites.net", "pages.dev", "workers.dev", "repl.co",
    "glitch.me", "onrender.com", "surge.sh", "neocities.org",
    "readthedocs.io", "wixsite.com", "s3.amazonaws.com"
  ) ++ usStates.flatMap(s =>
    Seq(s"$s.us", s"k12.$s.us", s"cc.$s.us", s"lib.$s.us"))

  /** WILDCARD rules, stored WITHOUT the `*.` — `"ck"` means `*.ck`. */
  val WildcardSuffixes: Seq[String] =
    Seq("bd", "ck", "er", "fk", "kh", "mm", "np", "pg", "kobe.jp")

  /** EXCEPTION rules, stored WITHOUT the `!`. */
  val ExceptionSuffixes: Seq[String] = Seq("www.ck", "city.kobe.jp")

  /** Parse the published `public_suffix_list.dat` wire format
    * (publicsuffix.org/list): one rule per line up to the first
    * whitespace; `//` lines (including the ICANN/PRIVATE section
    * markers) and blanks are comments; `!` prefix = exception, `*.`
    * prefix = wildcard, otherwise normal. Single-label NORMAL rules
    * (`com`, `net`, …) are DROPPED — they decide exactly like the
    * implicit `*` default (see the class doc), so only multi-label,
    * wildcard, and exception rules are data. Returns
    * (normal, wildcard, exception) with prefixes stripped. */
  private[graft] def parsePsl(
      lines: Iterator[String]): (Seq[String], Seq[String], Seq[String]) = {
    val normal = Seq.newBuilder[String]
    val wild = Seq.newBuilder[String]
    val exc = Seq.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim.takeWhile(c => !Character.isWhitespace(c))
      if (line.nonEmpty && !line.startsWith("//")) {
        val l = line.toLowerCase(java.util.Locale.ROOT)
        if (l.startsWith("!")) exc += l.substring(1)
        else if (l.startsWith("*.")) wild += l.substring(2)
        else if (l.contains(".")) normal += l
      }
    }
    (normal.result(), wild.result(), exc.result())
  }

  /** Full-PSL swap-in: when `GRAFT_PSL_FILE` names a readable copy of
    * the published `public_suffix_list.dat` (an offline file — zero
    * egress), every rule loads from it through [[parsePsl]];
    * otherwise the curated subset applies. Read once at class init —
    * the rule table ships to executors as a codegen reference object,
    * so it must be process-stable. */
  private val loadedRules: (Seq[String], Seq[String], Seq[String]) =
    sys.env.get("GRAFT_PSL_FILE")
      .filter(p => java.nio.file.Files.isReadable(java.nio.file.Paths.get(p)))
      .map { p =>
        val src = scala.io.Source.fromFile(p, "UTF-8")
        try parsePsl(src.getLines()) finally src.close()
      }
      .getOrElse((NormalSuffixes, WildcardSuffixes, ExceptionSuffixes))

  private[graft] def buildRules(normal: Seq[String], wild: Seq[String],
                                exc: Seq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def add(s: String, k: Int): Unit =
      m.merge(s, Integer.valueOf(k), (a, b) => Integer.valueOf(a | b)): Unit
    normal.foreach(add(_, Normal))
    wild.foreach(add(_, Wildcard))
    exc.foreach(add(_, Exception))
    m
  }

  /** suffix → kind bitmask (curated subset, or the full PSL when
    * `GRAFT_PSL_FILE` is set). */
  val rules: java.util.HashMap[String, Integer] =
    buildRules(loadedRules._1, loadedRules._2, loadedRules._3)

  /** The rule table as a SQL `(sfx, kind)` VALUES body (kind 0 normal,
    * 1 wildcard, 2 exception — one row per kind for dual-kind
    * suffixes), so the DuckDB oracle replays lookups from the SAME
    * loaded rule set the engine decides with. */
  lazy val rulesSqlValues: String = {
    def q(s: String) = s"'${s.replace("'", "''")}'"
    val rows =
      loadedRules._1.map(s => s"(${q(s)},0)") ++
        loadedRules._2.map(s => s"(${q(s)},1)") ++
        loadedRules._3.map(s => s"(${q(s)},2)")
    rows.mkString(", ")
  }

  /** PSL walk over a pre-validated lowercase host; see the class doc
    * for the exact algorithm. Returns null when the host is invalid
    * or is itself a public suffix. */
  def registeredDomain(hostRaw: String): String =
    registeredDomainIn(rules, hostRaw)

  /** [[registeredDomain]] against an explicit rule table — the same
    * walk the production path compiles against, testable with a
    * [[parsePsl]]-loaded table. */
  private[graft] def registeredDomainIn(
      table: java.util.HashMap[String, Integer], hostRaw: String): String = {
    if (hostRaw == null) return null
    val host = hostRaw.toLowerCase(java.util.Locale.ROOT)
    val n = host.length
    if (n == 0 || host.charAt(0) == '.' || host.charAt(n - 1) == '.' ||
      host.contains("..")) return null
    val labels = host.split('.')
    val nl = labels.length
    var excl = -1
    var best = 1
    var sfx = labels(nl - 1)
    var i = 1
    while (i <= nl) {
      val k = table.get(sfx)
      if (k != null) {
        val kv = k.intValue()
        if ((kv & Exception) != 0) excl = math.max(excl, i - 1)
        if ((kv & Normal) != 0) best = math.max(best, i)
        if ((kv & Wildcard) != 0 && i + 1 <= nl) best = math.max(best, i + 1)
      }
      i += 1
      if (i <= nl) sfx = labels(nl - i) + "." + sfx
    }
    val psLen = if (excl >= 1) excl else best
    if (nl > psLen) {
      val sb = new java.lang.StringBuilder(n)
      var j = nl - psLen - 1
      while (j < nl) {
        sb.append(labels(j))
        if (j < nl - 1) sb.append('.')
        j += 1
      }
      sb.toString
    } else null
  }

  /** UTF8String adapter for codegen/eval (null in → null out). */
  def registeredDomainUtf8(h: UTF8String): UTF8String = {
    if (h == null) return null
    val r = registeredDomain(h.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def psl_registered_domain(host: Column): Column =
    ColumnBridge.column(PslRegisteredDomain(ColumnBridge.expression(host)))
}

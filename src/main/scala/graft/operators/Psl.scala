package graft.operators

/** Representative subset of the Public Suffix List (publicsuffix.org)
  * embedded as data — the broadcast lookup table behind
  * [[Web.registrableDomain]]. The PSL is public, volunteer-maintained
  * data; this subset carries the high-traffic ccTLD second-level
  * registries (ICANN section) plus the hosting suffixes every crawl
  * hits (private section: `github.io`, `blogspot.com`, …), and one of
  * each RULE KIND so the full algorithm is exercised: exact rules,
  * wildcard rules (`*.ck`, `*.kawasaki.jp`) and exception rules
  * (`!www.ck`, `!city.kawasaki.jp`).
  *
  * Swapping in the complete list is a data refresh, not a code
  * change: the matcher only reads these four sets. At 9k entries the
  * sets still ship inside the plan as codegen'd `InSet` hash lookups
  * — O(1) per row, zero shuffle, exactly the "broadcast suffix
  * table" shape.
  *
  * Matching algorithm (PSL spec, publicsuffix.org/list/): a rule
  * matches when its labels are a suffix of the host's labels; an
  * exception rule beats all others (its own labels are the
  * registrable domain); otherwise the LONGEST matching rule is the
  * public suffix and the registrable domain is that suffix plus one
  * more label; a host with no matching rule uses the implicit `*`
  * rule (the bare TLD is the suffix). A host that IS a public suffix
  * has no registrable domain — this engine returns the host itself
  * (documented convention, keeps the rollup key total).
  */
object Psl {

  /** Exact 2-label rules (`co.uk`-class ccTLD registries + the
    * dominant private-section hosting suffixes).
    */
  val suffix2: Seq[String] = Seq(
    // uk
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk",
    // au / nz
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    // jp
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    // br / mx / ar
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    // cn / hk / tw / sg / kr
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    // in / za / ke / ng / eg / sa / pk / il / tr / th / my / ph / vn
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "edu.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    // ua / pl / id / ve
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve",
    // private section: hosted-platform suffixes
    "github.io", "gitlab.io", "gitbook.io", "blogspot.com",
    "herokuapp.com", "appspot.com", "firebaseapp.com", "netlify.app",
    "vercel.app", "web.app", "pages.dev", "workers.dev", "fly.dev",
    "onrender.com", "azurewebsites.net", "cloudapp.net",
    "cloudfront.net", "wordpress.com", "tumblr.com", "weebly.com",
    "wixsite.com", "neocities.org", "readthedocs.io", "surge.sh")

  /** Exact 3-label rules (US K-12/library registries, AWS S3,
    * GOV.UK services).
    */
  val suffix3: Seq[String] = Seq(
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.il.us",
    "k12.ma.us", "k12.wa.us", "cc.ca.us", "lib.ca.us", "lib.ny.us",
    "s3.amazonaws.com", "service.gov.uk", "act.edu.au", "nsw.edu.au",
    "vic.edu.au", "qld.edu.au")

  /** TLDs whose PSL rule is `*.tld` — EVERY second-level label under
    * them is itself a public suffix.
    */
  val wildcard1: Seq[String] = Seq("bd", "ck", "er", "kh", "mm", "np", "pg")

  /** 2-label bases whose rule is `*.base` (Japanese designated
    * cities: `*.kawasaki.jp`, …) — any third-level label under them
    * is a public suffix.
    */
  val wildcard2: Seq[String] = Seq(
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp")

  /** Exception rules (`!rule` in the PSL): the rule's own labels ARE
    * the registrable domain, overriding any wildcard that would
    * otherwise swallow them.
    */
  val exception2: Seq[String] = Seq("www.ck")

  /** 3-label exception rules (the designated-city `!city.*.jp` set). */
  val exception3: Seq[String] = Seq(
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  private def sqlList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString(", ")

  /** The same longest-match + wildcard + exception lookup as a DuckDB
    * CASE over `hl` (the host's label list) and `host` — generated
    * from the SAME sets the Spark side broadcasts, so the two engines
    * cannot drift. `sufLenSql` yields the matched public-suffix label
    * count; [[domainCaseSql]] applies exception short-circuits and
    * slices the last (sufLen+1) labels.
    */
  def domainCaseSql(hl: String, host: String): String =
    s"""CASE
        WHEN len($hl) <= 1 THEN $host
        WHEN len($hl) >= 2 AND ($hl[-2] || '.' || $hl[-1])
          IN (${sqlList(exception2)}) THEN $hl[-2] || '.' || $hl[-1]
        WHEN len($hl) >= 3 AND ($hl[-3] || '.' || $hl[-2] || '.' || $hl[-1])
          IN (${sqlList(exception3)})
          THEN $hl[-3] || '.' || $hl[-2] || '.' || $hl[-1]
        ELSE array_to_string(
          $hl[greatest(1, len($hl) - (CASE
            WHEN len($hl) >= 3 AND (($hl[-3] || '.' || $hl[-2] || '.' || $hl[-1])
                IN (${sqlList(suffix3)})
              OR ($hl[-2] || '.' || $hl[-1]) IN (${sqlList(wildcard2)})) THEN 3
            WHEN ($hl[-2] || '.' || $hl[-1]) IN (${sqlList(suffix2)})
              OR $hl[-1] IN (${sqlList(wildcard1)}) THEN 2
            ELSE 1 END)) : len($hl)], '.')
        END"""
}

package graft.functions

/** Vendored public-suffix snapshot (publicsuffix.org is public data;
  * this container has no egress, so the list is an ICANN-section
  * subset committed here — swap in the complete file at deploy time,
  * the rule SEMANTICS below are the full algorithm). Three rule kinds
  * per the PSL spec:
  *
  *  - normal rules: the rule's labels are a public suffix
  *  - wildcard rules `*.base`: any ONE label under `base` is a public
  *    suffix (so the registrable domain keeps base+2 labels)
  *  - exception rules `!rule`: prevail over everything; the public
  *    suffix is the rule minus its leftmost label (so the rule itself
  *    is the registrable domain)
  *
  * Longest match wins among non-exception rules; an unlisted TLD gets
  * the implicit `*` rule (last label is the suffix). */
object PslData {

  /** Normal rules, grouped by label count (1-label TLDs are redundant
    * with the implicit default rule but kept for fidelity). */
  val normal: Seq[String] = Seq(
    // 2-label: United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    // India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "gov.in", "ac.in",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za",
    // assorted ccSLDs
    "com.ar", "com.mx", "gob.mx", "org.mx", "com.tr", "com.sg",
    "com.hk", "com.tw", "co.kr", "or.kr", "go.kr", "co.th", "in.th",
    "go.th", "ac.th", "com.my", "com.ph", "com.vn", "com.eg", "com.sa",
    "co.il", "org.il", "ac.il", "gov.il",
    // 3-label: Australian state education, US k12/cc/lib families
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    "k12.ak.us", "k12.al.us", "k12.ca.us", "k12.ma.us", "k12.ny.us",
    "k12.tx.us", "k12.wa.us",
    "cc.ca.us", "cc.ny.us", "lib.ca.us", "lib.ny.us")

  /** Wildcard rules, stored as their base (the `*.` stripped). */
  val wildcardBases: Seq[String] = Seq(
    "ck", "er", "bd", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp")

  /** Exception rules (the leading `!` stripped). */
  val exceptions: Seq[String] = Seq(
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  private def labels(s: String): Int = s.count(_ == '.') + 1

  def normalByLen(k: Int): Seq[String] = normal.filter(labels(_) == k)
  def wildcardBasesByLen(k: Int): Seq[String] = wildcardBases.filter(labels(_) == k)
  def exceptionsByLen(k: Int): Seq[String] = exceptions.filter(labels(_) == k)

  /** Longest public suffix any rule can produce (wildcards add one). */
  val maxPsLen: Int = math.max(
    normal.map(labels).max,
    wildcardBases.map(labels).max + 1)
  val maxExcLen: Int = exceptions.map(labels).max
}

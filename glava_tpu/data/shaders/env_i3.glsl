#request setxwintype "!-"
